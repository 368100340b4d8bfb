"""Pipeline process graph (F7): column-level dataflow over a PipelineSpec.

Spark-native reimplementation of the reference ProcessGraph
(reference src/hyped/data/graph.py:54-183): nodes are input features,
stages, and output features; edges carry the feature names flowing between
them; each node sits on a LAYER (dataflow depth), giving the same
num-layers / max-width shape metrics.

Where the reference reads ``required_feature_keys`` off each processor
config, stage inputs here are discovered from Catalyst itself: every probe
is an EMPTY-DataFrame analysis (no IO, no jobs — the prepare-time
discipline of ``PipelineSpec.probe_schema``), and a stage CONSUMES column
``c`` iff analyzing the stage without ``c`` fails. That is exact for
expression-referencing stages (select / filter / withColumn / sql / ...);
stages that implicitly operate on "whatever columns are present" (e.g.
flatten) tolerate the drop and report no edge for ``c`` — a documented
approximation of dynamic column use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T


@dataclass
class GraphNode:
    node_id: int
    kind: str          # "input" | "stage" | "output"
    label: str
    layer: int
    exec_index: int    # stage position, -1 for features


@dataclass
class PipeGraph:
    nodes: list[GraphNode] = field(default_factory=list)
    # (src_node_id, dst_node_id, [feature names])
    edges: list[tuple[int, int, list[str]]] = field(default_factory=list)

    @property
    def num_layers(self) -> int:
        return max((n.layer for n in self.nodes), default=-1) + 1

    @property
    def max_width(self) -> int:
        widths: dict[int, int] = {}
        for n in self.nodes:
            widths[n.layer] = widths.get(n.layer, 0) + 1
        return max(widths.values(), default=0)

    def to_dot(self) -> str:
        """Graphviz DOT text (the reference's plot() analogue — render
        offline with any dot viewer)."""
        shape = {"input": "ellipse", "stage": "box", "output": "ellipse"}
        out = ["digraph pipeline {", "  rankdir=LR;"]
        for n in self.nodes:
            out.append(
                f'  n{n.node_id} [label="{n.label}" shape={shape[n.kind]}];'
            )
        for src, dst, feats in self.edges:
            out.append(f'  n{src} -> n{dst} [label="{", ".join(feats)}"];')
        out.append("}")
        return "\n".join(out)

    def render_svg(self, node_w: int = 150, node_h: int = 36,
                   dx: int = 230, dy: int = 64) -> str:
        """Self-contained SVG rendering of the graph — the analogue of the
        reference's matplotlib ``plot()`` (reference src/hyped/data/
        graph.py:185-280) with the same multipartite layer layout, but
        dependency-free: inputs/outputs as ellipses, stages as boxes,
        labeled edges, one column per dataflow layer."""
        from xml.sax.saxutils import escape

        by_layer: dict[int, list[GraphNode]] = {}
        for n in self.nodes:
            by_layer.setdefault(n.layer, []).append(n)
        max_rows = max((len(v) for v in by_layer.values()), default=1)
        height = max_rows * dy + dy
        width = (self.num_layers or 1) * dx + dx // 2
        pos: dict[int, tuple[float, float]] = {}
        for lyr, nodes in sorted(by_layer.items()):
            # center each layer's column vertically, stable order by id
            top = (height - len(nodes) * dy) / 2 + dy / 2
            for i, n in enumerate(sorted(nodes, key=lambda x: x.node_id)):
                pos[n.node_id] = (lyr * dx + dx / 2, top + i * dy)

        out = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}">',
            '<defs><marker id="arr" markerWidth="8" markerHeight="8" '
            'refX="7" refY="3" orient="auto"><path d="M0,0 L7,3 L0,6 z" '
            'fill="#555"/></marker></defs>',
            f'<rect width="{width}" height="{height}" fill="white"/>',
        ]
        for src, dst, feats in self.edges:
            (x1, y1), (x2, y2) = pos[src], pos[dst]
            x1e, x2e = x1 + node_w / 2, x2 - node_w / 2
            out.append(
                f'<line x1="{x1e:.0f}" y1="{y1:.0f}" x2="{x2e:.0f}" '
                f'y2="{y2:.0f}" stroke="#555" stroke-width="1" '
                'marker-end="url(#arr)"/>'
            )
            if feats:
                mx, my = (x1e + x2e) / 2, (y1 + y2) / 2 - 4
                out.append(
                    f'<text x="{mx:.0f}" y="{my:.0f}" font-size="9" '
                    f'fill="#777" text-anchor="middle">'
                    f'{escape(", ".join(feats))}</text>'
                )
        fill = {"input": "#dbeafe", "stage": "#dcfce7", "output": "#fee2e2"}
        for n in self.nodes:
            x, y = pos[n.node_id]
            if n.kind == "stage":
                out.append(
                    f'<rect x="{x - node_w / 2:.0f}" y="{y - node_h / 2:.0f}" '
                    f'width="{node_w}" height="{node_h}" rx="4" '
                    f'fill="{fill[n.kind]}" stroke="#333"/>'
                )
            else:
                out.append(
                    f'<ellipse cx="{x:.0f}" cy="{y:.0f}" rx="{node_w // 2}" '
                    f'ry="{node_h // 2}" fill="{fill[n.kind]}" stroke="#333"/>'
                )
            out.append(
                f'<text x="{x:.0f}" y="{y + 4:.0f}" font-size="11" '
                f'text-anchor="middle">{escape(n.label)}</text>'
            )
        out.append("</svg>")
        return "\n".join(out)


def build_graph(spark: SparkSession, spec,
                in_schema: T.StructType | None = None) -> PipeGraph:
    """Build the process graph for a PipelineSpec (prepare-time only)."""
    from hyped_spark.plans.spec import PipelineSpec

    if in_schema is None:
        if spec.source is None:
            raise ValueError("need in_schema when the spec has no source")
        in_schema = spec.source.spark_schema(spark)

    g = PipeGraph()
    next_id = iter(range(10 ** 9))

    # producer node + layer per live column (reference graph.py:88-90)
    producer: dict[str, int] = {}
    layer: dict[str, int] = {}
    for f in in_schema.fields:
        nid = next(next_id)
        g.nodes.append(GraphNode(nid, "input", f.name, 0, -1))
        producer[f.name] = nid
        layer[f.name] = 0

    cur = in_schema
    for i, stage in enumerate(spec.stages):
        single = PipelineSpec(source=None, stages=[stage])
        out_schema = single.probe_schema(spark, cur)

        consumed = []
        for c in cur.names:
            if len(cur.names) == 1:
                consumed.append(c)  # sole column is trivially the input
                continue
            reduced = T.StructType([f for f in cur.fields if f.name != c])
            try:
                single.probe_schema(spark, reduced)
            except Exception:
                consumed.append(c)

        label = stage.get("op", "pipeline") if isinstance(stage, dict) else str(stage)
        stage_layer = max((layer[c] for c in consumed), default=0) + 1
        nid = next(next_id)
        g.nodes.append(GraphNode(nid, "stage", label, stage_layer, i))

        # group consumed features by the node that provides them
        by_src: dict[int, list[str]] = {}
        for c in consumed:
            by_src.setdefault(producer[c], []).append(c)
        for src, feats in sorted(by_src.items()):
            g.edges.append((src, nid, feats))

        # columns added or retyped by this stage are now produced by it;
        # columns absent from the output are dropped from the live set
        in_types = {f.name: f.dataType for f in cur.fields}
        for f in out_schema.fields:
            if f.name not in in_types or in_types[f.name] != f.dataType:
                producer[f.name] = nid
                layer[f.name] = stage_layer
        for gone in set(in_types) - set(out_schema.names):
            producer.pop(gone, None)
            layer.pop(gone, None)
        cur = out_schema

    for c in cur.names:
        if c not in producer:
            continue
        nid = next(next_id)
        g.nodes.append(GraphNode(nid, "output", c, layer[c] + 1, -1))
        g.edges.append((producer[c], nid, [c]))
    return g
