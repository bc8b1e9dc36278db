"""Test-side oracle: a direct, dependency-free transcription of the
reference pruner's algorithm (/root/reference/scripts/prune_ngsLD.py:104-186
— the graph-tool/pandas pipeline re-stated over plain dicts, step for
step). Exists so tests/test_tools.py can diff ngsld-prune against the
reference ALGORITHM (graph-tool itself is not installable here), not just
against properties.

Faithful details: abs() applied before filtering for weight_type 'a';
edges drop when dist > max_dist or (post-abs) weight < min_weight;
weight_type 'n' sets every surviving edge weight to 1; weights quantize
as int(w * 10**precision) (C-style truncation toward zero); the heaviest
node is the max summed quantized weight with ties broken by
lowercase-lexicographic name; keep_heavy drops the heavy node's
neighbors, default drops the heavy node; output sorts by (chr as string,
pos as int) and prints chr:pos.
"""

from __future__ import annotations


def prune_reference(rows, field_dist=3, field_weight=7, max_dist=None,
                    min_weight=None, weight_type="a", keep_heavy=False,
                    subset=None, weight_precision=4):
    """rows: iterable of TSV lines (no header). Returns (kept, dropped)
    name lists; kept ordered like the reference's pandas sort."""
    edges = []   # parallel edges survive load_graph_from_csv (multigraph)
    nodes = []
    seen = set()
    for ln in rows:
        f = ln.rstrip("\n").split("\t")
        u, v = f[0], f[1]
        dist = float(f[field_dist - 1])
        w = float(f[field_weight - 1])
        for x in (u, v):
            if x not in seen:
                seen.add(x)
                nodes.append(x)
        edges.append([u, v, dist, w])

    if weight_type == "a":
        for e in edges:
            e[3] = abs(e[3])
    if max_dist is not None:
        edges = [e for e in edges if not e[2] > max_dist]
    if min_weight is not None:
        edges = [e for e in edges if not e[3] < min_weight]
    if weight_type == "n":
        for e in edges:
            e[3] = 1.0

    if subset is not None:
        allowed = set(subset)
        nodes = [n for n in nodes if n in allowed]
        edges = [e for e in edges if e[0] in allowed and e[1] in allowed]

    q = 10 ** weight_precision
    iw = [int(e[3] * q) for e in edges]

    alive = set(nodes)
    dropped = []

    while True:
        live = [(e, w) for e, w in zip(edges, iw)
                if e[0] in alive and e[1] in alive]
        if not live:
            break
        weight = {n: 0 for n in alive}
        for (u, v, _, _), w in live:
            weight[u] += w
            weight[v] += w
        mx = max(weight.values())
        heavy = sorted((n for n in alive if weight[n] == mx),
                       key=lambda x: x.lower())[0]
        if keep_heavy:
            victims = sorted({u if v == heavy else v
                              for (u, v, _, _), _ in live
                              if heavy in (u, v)} - {heavy})
            dropped.extend(victims)
            alive -= set(victims)
        else:
            dropped.append(heavy)
            alive.discard(heavy)

    def sort_key(name):
        chrom, pos = name.split(":", 1)
        return (chrom, int(pos))

    kept = sorted(alive, key=sort_key)
    return kept, dropped
