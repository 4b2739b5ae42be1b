"""Probe: FIR execution-path shootout on the real TPU.

Compares poly (VPU slice-accumulate), pallas (kernels/fir_pallas.py), mxu
(banded matmul, ops/fir.py _fir_mxu) and fft (segmented overlap-save on the
matmul-DFT) at the production WBFM shapes plus a tap sweep for the
mxu-vs-fft crossover table.  Timing uses the scan-marginal method
(CLAUDE.md): time lax.scan over K1 vs K2 ticks, take the slope.

Run (one process against the TPU at a time):
    nohup timeout 560 python benchmarks/fir_mxu_probe.py > /tmp/mxu_probe.log 2>&1 &

Results (v5e via axon tunnel, 2026-08-18, tick = 2^21 complex samples,
input Msps = complex input samples consumed per second by that stage):

    shape                 poly      pallas    mxu       fft
    T=546  D=50  (WBFM1)  see /tmp log; recorded in BENCH_configs_r02.json
"""

from __future__ import annotations

import json
import os
import sys
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tpusdr.ops import cplx, fir
    from tpusdr.utils.profiling import scan_marginal

    tick = 1 << 21
    KS = (4, 32, 64)  # fast paths need long scans to rise above jitter
    rng = np.random.default_rng(0)
    xs = cplx.Complex(
        jax.device_put(rng.standard_normal((max(KS), tick)).astype(np.float32)),
        jax.device_put(rng.standard_normal((max(KS), tick)).astype(np.float32)),
    )

    shapes = [
        (546, 50, "wbfm_rf_single"),
        (65, 10, "wbfm_rf_stage1"),
        (47, 5, "wbfm_rf_stage2"),
        (128, 1, "audio_fir"),
        (512, 1, "long_fir"),
        (2048, 1, "vlong_fir"),
        (2048, 8, "vlong_decim"),
    ]
    results = {}
    for T, D, name in shapes:
        taps = np.hanning(T).astype(np.float32)
        taps /= taps.sum()
        h = jnp.asarray(taps)
        tick_d = (tick // D) * D  # streaming contract: block % D == 0
        xs_d = cplx.Complex(xs.re[:, :tick_d], xs.im[:, :tick_d])
        row = {}
        for mode in ("poly", "mxu", "fft", "pallas"):
            if mode == "pallas":
                if D < 2:
                    continue
                from tpusdr.kernels.fir_pallas import fir_decim_pallas

                def step(state, x, h=h, D=D, T=T):
                    ext = cplx.concat([state, x], axis=-1)
                    y = fir_decim_pallas(ext, h, D)
                    return ext[..., ext.shape[-1] - (T - 1) :], y

            else:

                def step(state, x, h=h, D=D, mode=mode):
                    return fir.fir_apply(state, x, h, D, mode)

            state0 = fir.fir_init_state(h, "pair")

            @jax.jit
            def run(state, xs, step=step):
                return lax.scan(step, state, xs)

            try:
                m = scan_marginal(run, state0, xs_d, ks=KS, max_spread=1.0)
                msps = tick_d / m["per_tick"] / 1e6
            except Exception as e:  # noqa: BLE001 - probe records failures
                msps = None
                print(f"{name} {mode}: FAILED {type(e).__name__}: {e}")
            row[mode] = round(msps, 1) if msps else None
            print(f"{name} T={T} D={D} {mode}: {row[mode]} Msps(in)", flush=True)
        results[name] = {"T": T, "D": D, **row}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
