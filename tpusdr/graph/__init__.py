"""tpusdr.graph — streaming graph runtime.

Replaces the reference's L3-L5 stack (Node/Sink/Source/Filter protocol,
BaseSink relocatable buffers, SteppingDriver demand recursion, factory
registry, JSON Component builder — SURVEY.md sections 2.5-2.8) with:

  * Block       — pure (state, block) -> (state', block) streaming operator
  * Chain       — linear composition with static rate planning
  * Graph       — DAG with named nodes/ports, JSON spec parity
  * registry    — name -> builder map ("Cosine", "Fir", "QuadDemod", ...)
  * StreamRunner— host-side driver: device feed, jitted step, sinks
"""

from tpusdr.graph.block import Block, SourceBlock  # noqa: F401
from tpusdr.graph.chain import Chain  # noqa: F401
from tpusdr.graph.queues import (  # noqa: F401
    CommandQueue,
    MergedRunner,
    QueueRegistry,
    get_queue_registry,
)
from tpusdr.graph.registry import get_registry, register_block  # noqa: F401
