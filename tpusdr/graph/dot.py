"""Graph -> Graphviz dot export.

Parity with the reference's DriverToDot structural observability
(/root/reference/src/driver/DriverToDot.cpp:30-120+, used by the 145.45 app
at 145.45_digital_signal_to_audio.cpp:575-587), including clusters for
nested composites (FilterDriver nesting -> nested Graph/Chain here).
"""

from __future__ import annotations

from tpusdr.graph.block import Block, SourceBlock
from tpusdr.graph.chain import Chain
from tpusdr.graph.graph import Graph


def _label(name: str, b: Block) -> str:
    extra = []
    if b.up != 1 or b.down != 1:
        extra.append(f"x{b.up}/{b.down}")
    if b.history:
        extra.append(f"hist {b.history}")
    tail = f"\\n{' '.join(extra)}" if extra else ""
    return f"{name}\\n[{b.__class__.__name__}]{tail}"


def to_dot(block: Block, name: str = "pipeline") -> str:
    lines = [f"digraph {name} {{", "  rankdir=LR;", "  node [shape=box];"]
    _emit(block, name, lines, prefix="", indent="  ")
    lines.append("}")
    return "\n".join(lines)


def _emit(block: Block, name: str, lines: list, prefix: str, indent: str) -> tuple[str, str]:
    """Emit a block; returns (entry_node_id, exit_node_id)."""
    if isinstance(block, Chain):
        lines.append(f"{indent}subgraph cluster_{_sid(prefix + name)} {{")
        lines.append(f'{indent}  label="{name}";')
        prev_exit = None
        entry = exit_ = None
        for bname, b in block.blocks:
            e_in, e_out = _emit(b, bname, lines, prefix + name + "_", indent + "  ")
            if entry is None:
                entry = e_in
            if prev_exit is not None:
                lines.append(f"{indent}  {prev_exit} -> {e_in};")
            prev_exit = e_out
            exit_ = e_out
        lines.append(f"{indent}}}")
        return entry, exit_
    if isinstance(block, Graph):
        lines.append(f"{indent}subgraph cluster_{_sid(prefix + name)} {{")
        lines.append(f'{indent}  label="{name}";')
        ids = {}
        for nname, b in block.nodes.items():
            ids[nname] = _emit(b, nname, lines, prefix + name + "_", indent + "  ")
        for e in block.edges:
            lbl = f' [label="p{e.dst_port}"]' if e.dst_port else ""
            lines.append(
                f"{indent}  {ids[e.src][1]} -> {ids[e.dst][0]}{lbl};"
            )
        lines.append(f"{indent}}}")
        entry = None
        for _ep, node, _p in block.input_map:
            entry = ids[node][0]
            break
        exit_ = ids[block.outputs[0]][1] if block.outputs else None
        return entry, exit_
    nid = _sid(prefix + name)
    shape = "ellipse" if isinstance(block, SourceBlock) else "box"
    lines.append(f'{indent}{nid} [label="{_label(name, block)}" shape={shape}];')
    return nid, nid


def _sid(s: str) -> str:
    return "n_" + "".join(c if c.isalnum() else "_" for c in s)
