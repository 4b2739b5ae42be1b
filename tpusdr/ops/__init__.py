"""tpusdr.ops — pure-function DSP math core (JAX, CPU-testable).

The analog of the reference's L0 kernel library (external kernrj/gsdr CUDA
kernels, SURVEY.md section 2.9) plus its filter-math layer, re-designed as
pure functions over jnp arrays with explicit streaming carries.
"""

from tpusdr.ops import (  # noqa: F401
    channelizer,
    convert,
    cplx,
    demod,
    design,
    fft,
    fir,
    iir,
    mix,
    osc,
    resample,
    xmath,
)
