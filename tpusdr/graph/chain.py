"""Chain: linear composition of Blocks with static rate planning.

Replaces the SteppingDriver's demand-driven recursion and runtime
rate-matching (/root/reference/src/driver/SteppingDriver.cpp:193-287) for the
(overwhelmingly common) linear pipeline case: because every block's rate
ratio is a static rational, the whole chain's shapes are computed in closed
form at build time — one jitted function per streaming tick, no negotiation.

The per-block carries live in a dict pytree keyed by block name; that dict is
the checkpointable "stream state" the reference keeps implicitly in GPU
buffers (SURVEY.md section 5, checkpoint/resume: none in reference).
"""

from __future__ import annotations

from fractions import Fraction
from typing import Iterable, Sequence

import jax.numpy as jnp

from tpusdr.graph.block import Block
from tpusdr.utils.numerics import lcm


class Chain(Block):
    """A linear pipeline of single-input blocks, itself usable as a Block
    (the composite/"Component" idea of FilterDriver.cpp:87-214, without the
    re-entrant stepping)."""

    def __init__(self, blocks: Iterable[tuple[str, Block] | Block]):
        named: list[tuple[str, Block]] = []
        for i, b in enumerate(blocks):
            if isinstance(b, tuple):
                named.append(b)
            else:
                named.append((f"{i}_{b.__class__.__name__}", b))
        names = [n for n, _ in named]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate block names in chain: {names}")
        for n, b in named:
            if b.n_inputs != 1:
                raise ValueError(
                    f"chain block {n!r} has {b.n_inputs} inputs; use Graph "
                    "for multi-input topologies"
                )
        self.blocks = named
        self._recompute_plan()

    def _recompute_plan(self) -> None:
        """(Re)derive aggregate rate ratio, granule, history and dtypes from
        the member blocks — called at build time and after
        update_block_parameters (taps changes alter the history)."""
        named = self.blocks
        # Aggregate rational rate ratio and input granule.
        ratio = Fraction(1)
        gran = 1
        for _, b in named:
            # need (n * ratio) % b.granule == 0 for every tick length n
            num, den = ratio.numerator, ratio.denominator
            g = b.granule * den
            import math

            gran = lcm(gran, g // math.gcd(num, g))
            ratio *= Fraction(b.up, b.down)
        self._ratio = ratio
        self._granule = gran
        self.up, self.down = ratio.numerator, ratio.denominator

        # Total lookback expressed in *input-rate* samples (for halo sizing).
        hist = Fraction(0)
        r = Fraction(1)
        for _, b in named:
            hist += Fraction(b.history, 1) / r
            r *= Fraction(b.up, b.down)
        self.history = int(hist.__ceil__())

        self.num_channels = 1
        for _, b in named:
            if b.adds_channel_axis:
                self.adds_channel_axis = True
                self.num_channels = b.num_channels

        if named:
            self.in_dtype = named[0][1].in_dtype
            self.out_dtype = named[-1][1].out_dtype

    @property
    def granule(self) -> int:
        return self._granule

    def get_block(self, name: str) -> Block:
        for n, b in self.blocks:
            if n == name:
                return b
        raise KeyError(f"no block named {name!r} in chain")

    def update_block_parameters(self, name: str, **params) -> None:
        """Runtime parameter update on a member block (the reference's
        Node::updateParameters reached through a composite, Filter.h:36).
        Rate ratios must not change (that would alter every downstream
        shape); history changes are folded back into the chain plan.
        Rebuild any jitted step afterwards (StreamRunner.refresh())."""
        b = self.get_block(name)
        old_rate = (b.up, b.down)
        b.update_parameters(**params)
        if (b.up, b.down) != old_rate:
            raise ValueError(
                f"update of {name!r} changed its rate {old_rate} -> "
                f"{(b.up, b.down)}; rebuild the chain instead"
            )
        self._recompute_plan()

    def update_block_parameters_json(self, name: str, payload) -> None:
        """JSON-payload form of update_block_parameters (camelCase keys
        accepted — Filter.h:36 updateParameters(json) parity)."""
        import json as _json

        from tpusdr.graph.graph import translate_params

        if isinstance(payload, str):
            payload = _json.loads(payload)
        self.update_block_parameters(name, **translate_params(payload))

    def init_state(self, batch_shape: Sequence[int] = ()):
        state = {}
        shape = tuple(batch_shape)
        for name, b in self.blocks:
            state[name] = b.init_state(shape)
            if b.adds_channel_axis:
                shape = shape + (b.num_channels,)
        return state

    def apply(self, state: dict, x: jnp.ndarray):
        new_state = {}
        for name, b in self.blocks:
            new_state[name], x = b.apply(state[name], x)
        return new_state, x

    def out_len(self, in_len: int) -> int:
        n = in_len
        for name, b in self.blocks:
            n = b.out_len(n)
        return n

    def shift_state(self, state: dict, offset_samples) -> dict:
        """Per-block closed-form state shift (time-sharding hook); the
        traced input-sample offset is rescaled through each stage's rate
        ratio (exact: offsets are granule multiples)."""
        import jax.numpy as _jnp

        o = _jnp.asarray(offset_samples, _jnp.int32)
        new = {}
        for name, b in self.blocks:
            new[name] = b.shift_state(state[name], o)
            if b.up != 1 or b.down != 1:
                o = (o * b.up) // b.down
        return new

    def advance_state(self, state: dict, num_samples: int) -> dict:
        n = num_samples
        new = {}
        for name, b in self.blocks:
            new[name] = b.advance_state(state[name], n)
            n = n * b.up // b.down
        return new

    def split_shardable(self) -> tuple["Chain", "Chain | None"]:
        """Split into (time-shardable prefix, sequential tail).  IIR blocks
        (unbounded memory) land in the tail, which runs post-gather on the
        decimated stream where it is cheap."""
        k = len(self.blocks)
        for i, (_, b) in enumerate(self.blocks):
            if not b.time_shardable:
                k = i
                break
        head = Chain(self.blocks[:k])
        tail = Chain(self.blocks[k:]) if k < len(self.blocks) else None
        return head, tail

    def plan(self, in_len: int) -> list[tuple[str, int, int]]:
        """(name, in_len, out_len) per stage — the static analog of the
        SteppingDriver's per-pass size negotiation, for introspection."""
        out = []
        n = in_len
        for name, b in self.blocks:
            m = b.out_len(n)
            out.append((name, n, m))
            n = m
        return out

    def __repr__(self) -> str:  # pragma: no cover
        inner = " -> ".join(n for n, _ in self.blocks)
        return f"Chain[{inner}] (x{self.up}/{self.down}, granule {self.granule})"
