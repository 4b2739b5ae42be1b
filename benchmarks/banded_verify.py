"""Verify the banded Pallas kernel's COMPILED output values on the chip.

CLAUDE.md: compiled Mosaic faults do NOT surface via block_until_ready —
only on host transfer — so correctness of the compiled kernel must be
established by fetching values and comparing against the XLA mxu path.
Interpret-mode tests (tests/test_banded_pallas.py) prove the math; this
probe proves the chip runs it.  VERDICT r3 next #4.

Run: nohup timeout 560 python benchmarks/banded_verify.py > /tmp/banded_verify.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="e.g. cpu for a smoke run")
    args = ap.parse_args()

    import jax

    if args.platform:
        # the axon plugin overrides JAX_PLATFORMS (CLAUDE.md); only the
        # config knob reliably forces CPU
        jax.config.update("jax_platforms", args.platform)

    from tpusdr.graph import blocks as B
    from tpusdr.kernels.dispatch import pallas_mode
    from tpusdr.kernels.fir_banded_pallas import banded_fir_pallas, eligible
    from tpusdr.ops import cplx, fir

    interpret = pallas_mode() == "interpret"

    import scipy.signal as sps

    fs = 20e6
    rng = np.random.default_rng(0)

    # 1) raw kernel vs XLA mxu: WBFM front-end shape (T=546, D=50, complex
    #    folded taps) and a real-taps decimator (T=250, D=125)
    cases = []
    t546 = sps.firwin(546, 2 * 100e3 / fs).astype(np.float32)
    shift = np.exp(-2j * np.pi * 2.5e6 / fs * np.arange(546)).astype(np.complex64)
    cases.append(("cplx_546_50", t546 * shift, 50))
    cases.append(("real_250_125", sps.firwin(250, 0.005).astype(np.float32), 125))

    n = 1 << 20
    for name, taps, dec in cases:
        T = np.shape(taps)[-1]
        assert eligible(T, dec, np.iscomplexobj(taps)), name
        x = cplx.Complex(
            rng.standard_normal(n + T - 1).astype(np.float32),
            rng.standard_normal(n + T - 1).astype(np.float32),
        )

        @jax.jit
        def run_pallas(x, taps=taps, dec=dec):
            return banded_fir_pallas(x, taps, dec, interpret=interpret)

        @jax.jit
        def run_xla(x, taps=taps, dec=dec):
            return fir.fir_extended(x, taps, dec, mode="mxu")

        yp = run_pallas(x)
        yx = run_xla(x)
        # host fetch = the only reliable fault surface + value check
        pr, pi = np.asarray(yp.re), np.asarray(yp.im)
        xr, xi = np.asarray(yx.re), np.asarray(yx.im)
        scale = max(np.abs(xr).max(), np.abs(xi).max())
        err = max(np.abs(pr - xr).max(), np.abs(pi - xi).max()) / scale
        print(
            json.dumps(
                {
                    "case": name,
                    "n_out": int(pr.shape[-1]),
                    "rel_err_vs_xla": float(f"{err:.3g}"),
                    "ok": bool(err < 1e-5),
                }
            ),
            flush=True,
        )

    # 2) FusedFmDemod end-to-end: banded vs unfused chain front end
    taps = sps.firwin(546, 2 * 100e3 / fs).astype(np.float32)
    fused = B.FusedFmDemod(fs, -2.5e6, taps, 50, gain=1.0)
    shift_fir = B.FreqShiftFir(fs, -2.5e6, taps, 50, mode="mxu")
    demod = B.QuadFmDemod(gain=1.0)

    blk_n = 1 << 20
    x = cplx.Complex(
        rng.standard_normal(blk_n).astype(np.float32),
        rng.standard_normal(blk_n).astype(np.float32),
    )

    @jax.jit
    def run_fused(s, x):
        s, y = fused.apply(s, x)
        return y

    @jax.jit
    def run_unfused(s1, s2, x):
        s1, v = shift_fir.apply(s1, x)
        s2, y = demod.apply(s2, v)
        return y

    yf = np.asarray(run_fused(fused.init_state(), x))
    yu = np.asarray(run_unfused(shift_fir.init_state(), demod.init_state(), x))
    m = min(yf.shape[-1], yu.shape[-1])
    err = np.abs(yf[..., :m] - yu[..., :m]).max() / max(1e-30, np.abs(yu).max())
    print(
        json.dumps(
            {
                "case": "fused_fm_demod_vs_unfused",
                "n_out": int(m),
                "rel_err": float(f"{err:.3g}"),
                "ok": bool(err < 1e-4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
