"""Property-based SCC check: random small digraphs vs a pure-Python
Tarjan reference.  Complements the DuckDB transitive-closure oracle in
tests/test_graph_algos.py with adversarial shapes (nested cycles,
self-loops, disconnected pieces) hypothesis likes to find."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cypher_for_apache_flink_spark.functions.graph_algos import (
    strongly_connected_components)


def tarjan_scc(edges):
    """Iterative Tarjan; returns {node: min-node-id-of-its-SCC}."""
    adj = {}
    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        adj.setdefault(a, []).append(b)
    index, low, onstack = {}, {}, set()
    stack, result, counter = [], {}, [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    result[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return result


edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=7),
              st.integers(min_value=0, max_value=7)),
    min_size=1, max_size=16).map(lambda es: sorted(set(es)))


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_lists)
def test_scc_matches_tarjan(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component
           for r in strongly_connected_components(
               df, max_rounds=10).collect()}
    assert got == tarjan_scc(edges)
