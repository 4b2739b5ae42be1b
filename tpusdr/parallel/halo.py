"""Time-block sharding with overlap-save halo exchange.

The core multi-chip mechanism (BASELINE.md config 5; SURVEY.md section 5
"long-context analog"): a streaming tick of N input samples is split into S
contiguous shards on a mesh axis.  Each shard needs the last H input samples
of its left neighbor to continue every filter in the chain — H is the
chain's total input-rate lookback (sum of each stage's taps-1/demod history,
Chain.history), rounded up to the chain granule so every stage's decimation
grid stays aligned with the unsharded run.

Per tick, inside shard_map:

  1. each shard sends its tail H samples right via ``lax.ppermute``
     (one ICI hop; shard 0 instead uses the cross-tick carry tail);
  2. the chain runs cold on [halo, shard] — the halo *warms up* every
     finite-memory carry to exactly its streaming value (the overlap-save
     trick: the reference's retained FIR tail, Fir.cpp:274-308, re-created
     from neighbor data instead of carried between calls);
  3. closed-form states (NCO phases) are set exactly via
     ``Chain.shift_state`` with the shard's absolute sample offset — uint32
     modular arithmetic, so the oscillator is bit-identical to the
     unsharded run;
  4. the first H*up/down outputs (the halo's outputs) are discarded.

Sequential-only stages (IIR de-emphasis — unbounded memory) are split off
with ``Chain.split_shardable`` and run on the gathered, decimated output
where they cost nothing.

Sharded output == unsharded output **bit-exactly** (asserted in
tests/test_parallel.py), because every output sample is computed from the
same window by the same reduction order.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusdr.graph.chain import Chain
from tpusdr.ops import cplx
from tpusdr.utils.logging import get_logger
from tpusdr.utils.numerics import round_up

log = get_logger("parallel")


def _concat(a, b):
    if cplx.is_pair(b):
        return cplx.concat([cplx.ensure_pair(a), b], axis=-1)
    return jnp.concatenate([a, b], axis=-1)


def _tail(x, h):
    return x[..., x.shape[-1] - h :]


def _select(pred, a, b):
    return jax.tree_util.tree_map(lambda u, v: jnp.where(pred, u, v), a, b)


class TimeShardedStream:
    """Run a Chain or (single-input, single-output) Graph with its
    streaming tick sharded across a mesh axis."""

    def __init__(
        self,
        chain,
        mesh: Mesh,
        axis: str | tuple[str, ...] = "dev",
        halo: int | None = None,
    ):
        self.full_chain = chain
        self.chain, self.tail_chain = chain.split_shardable()
        if isinstance(self.chain, Chain) and not self.chain.blocks:
            raise ValueError("chain has no time-shardable prefix")
        self.mesh = mesh
        # one or several mesh axes (e.g. ('host', 'chip') on a 2-D DCN x ICI
        # mesh); collectives treat the tuple as one flattened ring, so the
        # halo ppermute crosses DCN only at host boundaries.
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        self.axis = axes if len(axes) > 1 else axes[0]
        self.shards = int(np.prod([mesh.shape[a] for a in axes]))
        h = halo if halo is not None else self.chain.history
        self.halo = round_up(max(h, 1), self.chain.granule)
        # outputs to drop per shard (the halo's outputs)
        self.skip = self.halo * self.chain.up // self.chain.down
        # tick must clear (a) shards * shardable-head granule for the halo
        # alignment and (b) the FULL chain's granule (the sequential tail —
        # e.g. an audio resampler — has its own divisibility needs).
        from tpusdr.utils.numerics import lcm

        self.tick_granule = lcm(self.shards * self.chain.granule, chain.granule)
        self._step_cache: dict[int, Any] = {}
        log.info(
            "time sharding: %d shards on '%s', halo %d samples, skip %d",
            self.shards,
            axis,
            self.halo,
            self.skip,
        )

    # -- carries ------------------------------------------------------------

    def init_carry(self):
        carry = {
            "state": self.chain.init_state(),
            "tail": self._zero_tail(),
        }
        if self.tail_chain is not None:
            carry["tail_state"] = self.tail_chain.init_state(
                (self.chain.num_channels,) if self.chain.adds_channel_axis else ()
            )
        return carry

    def _zero_tail(self):
        if self.chain.in_dtype == jnp.complex64:
            return cplx.zeros((self.halo,))
        return jnp.zeros((self.halo,), dtype=self.chain.in_dtype)

    # -- the sharded step ---------------------------------------------------

    def _build_step(self, per_shard: int):
        chain = self.chain
        halo, skip, axis, shards = self.halo, self.skip, self.axis, self.shards

        def sharded_fn(carry_tail, state, x):
            # runs per-shard under shard_map
            idx = lax.axis_index(axis)
            my_tail = jax.tree_util.tree_map(lambda a: _tail(a, halo), x)
            perm = [(i, i + 1) for i in range(shards - 1)]
            left_tail = jax.tree_util.tree_map(
                lambda a: lax.ppermute(a, axis, perm), my_tail
            )
            halo_in = _select(idx == 0, carry_tail, left_tail)
            ext = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=-1), halo_in, x
            )
            offset = idx.astype(jnp.int32) * per_shard - halo
            local_state = chain.shift_state(state, offset)
            _, y_ext = chain.apply(local_state, ext)
            y = jax.tree_util.tree_map(lambda a: a[..., skip:], y_ext)
            return y

        in_specs = (
            jax.tree_util.tree_map(lambda _: P(), self._zero_tail()),
            jax.tree_util.tree_map(lambda _: P(), self.chain.init_state()),
            jax.tree_util.tree_map(lambda _: P(axis), self._example_x(per_shard)),
        )
        # output: time axis is the last; channelizer inserts a leading
        # channel axis which stays unsharded here.
        ndim_out = 2 if self.chain.adds_channel_axis else 1
        out_spec = P(*([None] * (ndim_out - 1) + [axis]))
        out_specs = jax.tree_util.tree_map(
            lambda _: out_spec, self._example_y(per_shard)
        )

        fn = jax.shard_map(
            sharded_fn,
            mesh=self.mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(fn)

    def _example_x(self, per_shard: int):
        n = per_shard * self.shards
        if self.chain.in_dtype == jnp.complex64:
            return cplx.zeros((n,))
        return jnp.zeros((n,), self.chain.in_dtype)

    def _example_y(self, per_shard: int):
        out = self.chain.out_len(per_shard) * self.shards
        shape = (
            (self.chain.num_channels, out) if self.chain.adds_channel_axis else (out,)
        )
        if self.chain.out_dtype == jnp.complex64:
            return cplx.zeros(shape)
        return jnp.zeros(shape, self.chain.out_dtype)

    # -- public api ---------------------------------------------------------

    def step(self, carry, x):
        """One sharded streaming tick.

        ``x``: the tick's input (pair or float array, last axis = time),
        globally shaped; shard it with ``self.input_sharding`` for real
        multi-device placement.  Returns (carry', y) with y gathered
        semantics (a sharded global array).
        """
        n = x.shape[-1]
        if n % self.tick_granule:
            raise ValueError(
                f"tick {n} must be divisible by tick_granule = "
                f"{self.tick_granule}"
            )
        per_shard = n // self.shards
        if per_shard < self.halo:
            raise ValueError(
                f"per-shard length {per_shard} smaller than halo {self.halo}"
            )
        if per_shard not in self._step_cache:
            self._step_cache[per_shard] = self._build_step(per_shard)
        y = self._step_cache[per_shard](carry["tail"], carry["state"], x)

        new_carry = dict(carry)
        new_carry["tail"] = jax.tree_util.tree_map(lambda a: _tail(a, self.halo), x)
        new_carry["state"] = self.chain.advance_state(carry["state"], n)

        if self.tail_chain is not None:
            new_carry["tail_state"], y = self.tail_chain.apply(
                carry["tail_state"], y
            )
        return new_carry, y

    def input_sharding(self):
        spec = P(self.axis)
        return NamedSharding(self.mesh, spec)
