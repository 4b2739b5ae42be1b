"""tpusdr.kernels — Pallas TPU kernels for the hot compute paths.

The role of the external gsdr CUDA kernel library in the reference
(SURVEY.md section 2.9), rebuilt as Mosaic/Pallas kernels:

  * fir_pallas: decimating FIR in polyphase-frame layout, one HBM read of
    the signal, accumulation entirely in VMEM;
  * fm_pallas: fused NCO-mix -> decimating FIR -> quadrature discriminator
    (the gsdrFmDemod precedent, fm_simpletest.cpp:400-414) — the whole
    WBFM front half in a single pass over HBM.
"""

from tpusdr.kernels.fir_pallas import fir_decim_pallas  # noqa: F401
from tpusdr.kernels.fm_pallas import fused_fm_demod_pallas  # noqa: F401
