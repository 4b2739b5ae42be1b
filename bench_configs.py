"""Extended benchmark: the BASELINE.json measurement configs, one JSON line
each (bench.py remains the single-line headline for the driver).

  1. CosineSource -> 64-tap FIR -> magnitude (FirTests/CosineSourceTests
     mirror), 1 Msample blocks
  2. int8 IQ -> convert -> shift -> decimating FIR -> QuadAmDemod
  3. WBFM chain: IQ -> polyphase decimate -> QuadFmDemod -> 48 kHz audio
  4. 64-channel PFB channelizer + FM demod bank

Config 5 (multi-host sustained capture) needs a pod; its machinery is
exercised by dryrun_multichip and apps/bench_scaling.

Usage: ``python bench_configs.py [--config N]`` — compiles through this
environment's TPU tunnel are slow, so running one config per process keeps
each run inside a sane timeout.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _time_step(step_fn, state, x=None, iters: int = 8) -> float:
    import jax

    args = (state,) if x is None else (state, x)
    state, y = step_fn(*args)
    jax.block_until_ready(y)
    state, y = (step_fn(state) if x is None else step_fn(state, x))
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, y = step_fn(state) if x is None else step_fn(state, x)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def _time_chain(chain, x, iters: int = 8) -> float:
    import jax

    step = jax.jit(chain.apply, donate_argnums=(0,))
    return _time_step(step, jax.device_put(chain.init_state()), jax.device_put(x), iters)


def config1() -> dict:
    """CosineSource -> 64-tap FIR -> Magnitude (tests/FirTests mirror)."""
    import jax
    import scipy.signal as sps

    from tpusdr.graph import blocks as B

    n1 = 1 << 20
    osc_b = B.CosineSource(20e6, 1.25e6, "FloatComplex")
    fir_b = B.Fir(sps.firwin(64, 0.2).astype(np.float32), 1)
    mag_b = B.Magnitude()

    def step(state):
        s = dict(state)
        s["osc"], v = osc_b.generate(state["osc"], n1)
        s["fir"], v = fir_b.apply(state["fir"], v)
        s["mag"], v = mag_b.apply(state["mag"], v)
        return s, v

    state = jax.device_put(
        {"osc": osc_b.init_state(), "fir": fir_b.init_state(), "mag": ()}
    )
    dt = _time_step(jax.jit(step, donate_argnums=(0,)), state)
    return {
        "metric": "cosine_fir64_magnitude_msps",
        "value": round(n1 / dt / 1e6, 2),
        "unit": "Msamples/s",
    }


def config2() -> dict:
    from tpusdr.models import receiver

    rng = np.random.default_rng(0)
    chain, _ = receiver.am_receiver(10e6, 1.25e6, input_format="int8")
    tick = chain.granule * max(1, (1 << 22) // chain.granule)
    raw = rng.integers(-128, 128, size=tick, dtype=np.int8)
    dt = _time_chain(chain, raw)
    return {
        "metric": "am_chain_int8_msps",
        "value": round(tick / 2 / dt / 1e6, 2),
        "unit": "Mcsamples/s",
    }


def config3() -> dict:
    from tpusdr.models import receiver
    from tpusdr.ops import cplx

    rng = np.random.default_rng(0)
    chain, _ = receiver.fm_receiver(20e6, 2.5e6, receiver.WBFM, 48000.0)
    tick = chain.granule * max(1, (1 << 23) // chain.granule)
    z = (rng.standard_normal(tick) + 1j * rng.standard_normal(tick)).astype(
        np.complex64
    )
    dt = _time_chain(chain, cplx.from_numpy(z))
    v = round(tick / dt / 1e6, 2)
    return {
        "metric": "wbfm_chain_msps",
        "value": v,
        "unit": "Msamples/s",
        "vs_baseline": round(v / 20.0, 2),
    }


def config4() -> dict:
    from tpusdr.models import multichannel
    from tpusdr.ops import cplx

    rng = np.random.default_rng(0)
    chain, _ = multichannel.fm_channel_bank(20.48e6, 64, 16000.0)
    tick = chain.granule * max(1, (1 << 22) // chain.granule)
    z = (rng.standard_normal(tick) + 1j * rng.standard_normal(tick)).astype(
        np.complex64
    )
    dt = _time_chain(chain, cplx.from_numpy(z))
    return {
        "metric": "fm_channel_bank64_msps",
        "value": round(tick / dt / 1e6, 2),
        "unit": "Msamples/s",
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=None, choices=sorted(CONFIGS))
    args = ap.parse_args()
    todo = [args.config] if args.config else sorted(CONFIGS)
    for i in todo:
        print(json.dumps(CONFIGS[i]()), flush=True)


if __name__ == "__main__":
    main()
