"""Config-5 scaling story: predicted multi-chip efficiency, from measured
single-chip rates + per-tick collective volumes + v5e interconnect nominals.

VERDICT r4 next #2: the >=90% linear-scaling target (BASELINE.md) had no
committed artifact.  Real multi-chip runs are impossible on this box (one
tunneled chip), but the arithmetic is not: every input below is either

  * measured on this chip (single-chip chain rates, BENCH_configs_r04/r05),
  * computed from the actual shard plan (halo sizes straight from
    TimeShardedStream's stage plan — the same object the tests execute on
    the virtual CPU mesh), or
  * a NAMED hardware nominal a reviewer can substitute (v5e ICI/DCN).

Model (time sharding, stagewise halos — parallel/halo.py):

  T_shard(tick, N) = per_shard/R_chip            # measured chip rate
                   + sum_k h_k/R_chip_k          # redundant halo warmup
                   + n_stages * (lat_ici + B_k/bw_ici)   # halo ppermutes
                   + hosts>1 ? lat_dcn : 0       # ring hop crossing DCN
                   + t_fixed                     # per-tick dispatch
  efficiency(N)    = T_1 / (N * T_shard)         # vs N x single chip

The chain-wide-halo variant replaces the warmup term with
halo_input * N/tick of *front-end-rate* redundant compute — the term that
breaks at large N and motivates the stagewise design.

Hardware nominals (substitutable via CLI):
  * ICI: 45 GB/s per link per direction, ~1 us hop latency (TPU v5e,
    jax-ml.github.io/scaling-book hardware table; 4 links/chip, the halo
    ppermute uses one).
  * DCN: 12.5 GB/s (100 Gbps) per host, ~25 us latency; 8 chips/host.
  * t_fixed: 10 us per tick on a PCIe-local host.  (This box's tunnel
    pays ~40 ms/dispatch — stated, and excluded: it is a dev-harness
    property, not a deployment property; the runner pipelines it away.)

Run (CPU, instant): python benchmarks/scaling_model.py [--rate-msps 4781.7]
Output: JSON lines -> committed as SCALING_r05.json with the CPU-mesh
execution evidence appended by apps/bench_scaling.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--rate-msps",
        type=float,
        default=5596.0,
        help="measured single-chip WBFM chain rate (BENCH_configs_r05 "
        "unfused row; the faster the chip, the harder the target)",
    )
    ap.add_argument("--fs", type=float, default=100e6, help="capture rate (config 5)")
    ap.add_argument("--ici-gbps", type=float, default=45.0, help="GB/s per link/dir")
    ap.add_argument("--ici-lat-us", type=float, default=1.0)
    ap.add_argument("--dcn-gbps", type=float, default=12.5, help="GB/s per host")
    ap.add_argument("--dcn-lat-us", type=float, default=25.0)
    ap.add_argument("--chips-per-host", type=int, default=8)
    ap.add_argument("--fixed-us", type=float, default=10.0, help="per-tick dispatch")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    from tpusdr.models import receiver
    from tpusdr.parallel.halo import TimeShardedStream
    from tpusdr.parallel.mesh import make_mesh

    chain, spec = receiver.fm_receiver(args.fs, 2.5e6, receiver.WBFM, 48000.0)
    tss = TimeShardedStream(chain, make_mesh(8), stagewise=True)

    # --- per-stage halo inventory (the collective payload, from the real
    # shard plan object) -----------------------------------------------------
    import jax.numpy as jnp

    stages = []
    rate = args.fs
    total_halo_bytes = 0
    total_redundant_input_equiv = 0.0
    for name, b, h_pad, skip, bshape in tss._stages:
        nbytes = 8 if b.in_dtype == jnp.complex64 else 4  # f32 pair vs f32
        bb = h_pad * nbytes
        total_halo_bytes += bb
        # a stage-k sample costs at most a front-end input sample of work
        # (each stage's per-sample cost measured within ~2x of the chain's,
        # PROFILE artifacts); count input-equivalents at 1:1 as the bound
        total_redundant_input_equiv += h_pad
        stages.append(
            {"stage": name, "rate_hz": rate, "halo_samples": h_pad, "bytes": bb}
        )
        rate = rate * b.up / b.down
    n_perm = sum(1 for s in stages if s["halo_samples"] > 0)
    emit(
        section="halo_inventory",
        fs=args.fs,
        rf_stages=list(spec.rf_stages),
        chainwide_halo_input_samples=tss.halo,
        stagewise=stages,
        stagewise_total_bytes=total_halo_bytes,
        n_ppermutes=n_perm,
    )

    R = args.rate_msps * 1e6  # chip rate, input samples/s
    bw_ici = args.ici_gbps * 1e9
    lat_ici = args.ici_lat_us * 1e-6
    lat_dcn = args.dcn_lat_us * 1e-6
    t_fixed = args.fixed_us * 1e-6

    def efficiency(n_chips: int, tick_s: float, mode: str):
        gran = n_chips * chain.granule
        tick = int(args.fs * tick_s) // gran * gran
        per_shard = tick // n_chips
        if per_shard < tss.halo and mode == "chainwide":
            return None
        t1 = tick / R
        t_comp = per_shard / R
        if mode == "stagewise":
            t_redund = total_redundant_input_equiv / R
            t_coll = n_perm * (lat_ici + (total_halo_bytes / n_perm) / bw_ici)
        else:
            t_redund = tss.halo / R
            t_coll = lat_ici + tss.halo * 8 / bw_ici
        hosts = max(1, n_chips // args.chips_per_host)
        # the ring halo crosses DCN at host boundaries; payload is tiny so
        # the latency term dominates (it overlaps the ICI hops; take max)
        t_coll = max(t_coll, lat_dcn if hosts > 1 else 0.0)
        t_shard = t_comp + t_redund + t_coll + t_fixed
        return {
            "n_chips": n_chips,
            "tick_s": round(tick / args.fs, 3),
            "per_shard_samples": per_shard,
            "mode": mode,
            "t_compute_us": round(t_comp * 1e6, 1),
            "t_redundant_us": round(t_redund * 1e6, 2),
            "t_collective_us": round(t_coll * 1e6, 2),
            "t_fixed_us": args.fixed_us,
            "efficiency_pct": round(100 * t1 / (n_chips * t_shard), 1),
            "agg_msps": round(tick / t_shard / 1e6, 0),
        }

    for n in (8, 32, 256):
        for tick_s in (0.1, 1.0, 4.0, 8.0):
            for mode in ("stagewise", "chainwide"):
                row = efficiency(n, tick_s, mode)
                if row:
                    emit(section="efficiency", **row)

    # --- ingest feasibility over DCN ----------------------------------------
    # int8 wire format: 2 B/sample; each host ingests fs/hosts samples/s
    for hosts in (1, 4, 32):
        emit(
            section="ingest",
            hosts=hosts,
            per_host_MBps=round(args.fs * 2 / hosts / 1e6, 1),
            dcn_MBps=args.dcn_gbps * 1e3,
            feasible=bool(args.fs * 2 / hosts <= args.dcn_gbps * 1e9),
        )

    # --- channel bank (config 4 at scale): co-located vs all_to_all ---------
    # Co-located (preferred): the 64-channel bank keeps its channel axis
    # BATCHED inside each time shard — zero extra collectives beyond the
    # stagewise halos above.  all_to_all is only needed when channels must
    # land on distinct chips; its volume is the whole channelized stream.
    for n in (8, 32):
        tick = int(args.fs * 1.0) // (n * 64) * (n * 64)
        per_chip_bytes = tick // n * 8
        t_a2a = lat_ici + per_chip_bytes * (n - 1) / n / bw_ici
        t_comp = tick / n / (3781.0e6)  # measured config-4 chip rate (r4)
        emit(
            section="channel_bank",
            n_chips=n,
            mode="all_to_all",
            t_compute_us=round(t_comp * 1e6, 1),
            t_a2a_us=round(t_a2a * 1e6, 1),
            efficiency_pct=round(100 * t_comp / (t_comp + t_a2a), 1),
            note="co-located channel axis avoids this entirely (0 extra bytes)",
        )


if __name__ == "__main__":
    main()
