"""tpusdr.parallel — mesh sharding for streaming DSP.

The distribution layer the reference lacks entirely (SURVEY.md section 2.10:
no multi-GPU, no collectives, no distributed backend).  Two shardings, per
BASELINE.md:

  * time-block sharding (parallel/halo.py): the stream's tick is split
    across devices; each shard re-creates its chain state from an
    overlap-save halo of the left neighbor's tail samples (one ppermute per
    tick) — the reference's per-filter "retain taps-1 samples"
    (Fir.cpp:274-308) lifted into a shard-boundary halo.
  * channel sharding (parallel/channels.py): the PFB channelizer's output
    channel axis is data-parallel; an all_to_all pivots time-sharded frames
    into channel-sharded streams whose per-channel demod state then lives
    permanently on its owning device.
"""

from tpusdr.parallel.halo import TimeShardedStream  # noqa: F401
from tpusdr.parallel.channels import ChannelShardedBank  # noqa: F401
from tpusdr.parallel.mesh import make_mesh  # noqa: F401
