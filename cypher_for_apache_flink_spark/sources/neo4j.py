"""Neo4j property-graph source (reference:
morpheus-spark-cypher/.../api/io/neo4j/Neo4jPropertyGraphDataSource.scala:108-140,
flat element queries in okapi-neo4j-io ElementReader).

Reads one DataFrame per exact label combination and per relationship type by
issuing flat Cypher queries over bolt.  The python ``neo4j`` driver is NOT
baked into this container, so the connected path is import-gated; the query
builders and schema plumbing are pure and unit-tested offline.  For
production-scale ingest prefer the official neo4j-spark-connector (SURVEY
§2.4) — this source is the dependency-free fallback, reading each element
table in id-range partitions.
"""
from __future__ import annotations

from ..graph import GraphSchema, PropertyGraph, prop_phys, _RESERVED_NODE, \
    _RESERVED_REL


def exact_label_query(labels, props, id_range=None) -> str:
    """Flat query for nodes whose label set equals ``labels`` exactly
    (ElementReader.flatExactLabelQuery).  Property columns are aliased to
    the table contract (reserved-name collisions escaped)."""
    combo = sorted(labels)
    match = "MATCH (n" + "".join(f":`{l}`" for l in combo) + ")"
    conds = [f"size(labels(n)) = {len(combo)}"]
    if id_range is not None:
        lo, hi = id_range
        conds.append(f"id(n) >= {lo} AND id(n) < {hi}")
    cols = ["id(n) AS id"] + [
        f"n.`{p}` AS `{prop_phys(p, _RESERVED_NODE)}`" for p in sorted(props)]
    return f"{match} WHERE {' AND '.join(conds)} RETURN {', '.join(cols)}"


def rel_type_query(rtype, props, id_range=None) -> str:
    """Flat query for one relationship type (ElementReader.flatRelTypeQuery)."""
    conds = []
    if id_range is not None:
        lo, hi = id_range
        conds.append(f"id(r) >= {lo} AND id(r) < {hi}")
    where = f" WHERE {' AND '.join(conds)}" if conds else ""
    cols = ["id(r) AS id", "id(s) AS source", "id(t) AS target"] + [
        f"r.`{p}` AS `{prop_phys(p, _RESERVED_REL)}`" for p in sorted(props)]
    return (f"MATCH (s)-[r:`{rtype}`]->(t){where} "
            f"RETURN {', '.join(cols)}")


def schema_queries() -> dict:
    """Discovery queries run once against small result sets."""
    return {
        # distinct exact label combos with a sample property map
        "combos": ("MATCH (n) RETURN DISTINCT labels(n) AS labels, "
                   "count(*) AS n"),
        "rel_types": ("MATCH ()-[r]->() RETURN DISTINCT type(r) AS type, "
                      "count(*) AS n"),
        "node_props": ("MATCH (n) UNWIND keys(n) AS k "
                       "RETURN DISTINCT labels(n) AS labels, k"),
        "rel_props": ("MATCH ()-[r]->() UNWIND keys(r) AS k "
                      "RETURN DISTINCT type(r) AS type, k"),
        "id_bounds": ("MATCH (n) RETURN min(id(n)) AS lo, max(id(n)) AS hi"),
    }


def _require_driver():
    try:
        import neo4j  # noqa: F401
        return neo4j
    except ImportError as e:  # pragma: no cover - driver not in container
        raise ImportError(
            "the python 'neo4j' bolt driver is required for connected reads "
            "(pip install neo4j), or use the neo4j-spark-connector for "
            "cluster-scale ingest") from e


def neo4j_graph(spark, uri: str, auth, schema: GraphSchema,
                database: str = "neo4j", partitions: int = 8,
                name: str = "neo4j") -> PropertyGraph:  # pragma: no cover
    """Read a Neo4j database into a :class:`PropertyGraph`.

    ``schema`` declares which label combos / rel types (and their property
    dtypes) to load — mirroring the reference, where the schema is read
    first and drives one flat query per element table.  Each table is read
    in ``partitions`` id-range slices so the bolt pulls parallelise.
    """
    neo4j = _require_driver()
    driver = neo4j.GraphDatabase.driver(uri, auth=auth)

    def fetch(q):
        with driver.session(database=database) as s:
            return [dict(r) for r in s.run(q)]

    bounds = fetch(schema_queries()["id_bounds"])[0]
    lo, hi = (bounds["lo"] or 0), (bounds["hi"] or 0) + 1
    step = max(1, (hi - lo + partitions - 1) // partitions)
    ranges = [(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read_table(query_fn, key, props):
        rows = []
        for rng in ranges:
            rows.extend(fetch(query_fn(key, props, id_range=rng)))
        return spark.createDataFrame(rows) if rows else None

    node_tables = {}
    for combo, props in schema.node_props.items():
        df = read_table(lambda c, p, id_range: exact_label_query(
            c, p, id_range), combo, props)
        if df is not None:
            node_tables[combo] = df
    rel_tables = {}
    for rtype, props in schema.rel_props.items():
        df = read_table(lambda t, p, id_range: rel_type_query(
            t, p, id_range), rtype, props)
        if df is not None:
            rel_tables[rtype] = df
    driver.close()
    return PropertyGraph(node_tables, rel_tables, name=name)


# ---------------------------------------------------------------------------
# Merge-sync write-back (reference: Neo4jGraphMerge.scala:53-170 +
# ElementWriter.scala:44-112).  The statement builders are pure (offline
# unit-tested); the executor streams each element table's partitions
# through batched UNWIND ... MERGE calls over bolt — Spark's
# foreachPartition is the PySpark analogue of the reference's
# foreachPartitionAsync writers.
# ---------------------------------------------------------------------------

META_PROP = "__cfas_id"     # transient match key, removed after the sync
                            # (the reference's metaPropertyKey)


def _label_string(labels) -> str:
    return "".join(f":`{l}`" for l in sorted(labels))


def merge_node_statement(labels, keys, columns, meta_label=None) -> str:
    """UNWIND-batched MERGE for one node table.  ``columns`` is the table's
    column order (id first); ``keys`` the property names that uniquely
    identify a node with these labels (schema nodeKeys)."""
    lbl = _label_string(set(labels) | ({meta_label} if meta_label else set()))
    key_props = ", ".join(
        f"`{k}`: row[{columns.index(prop_phys(k, _RESERVED_NODE))}]"
        for k in sorted(keys))
    sets = [f"SET n.`{META_PROP}` = row[{columns.index('id')}]"]
    for i, c in enumerate(columns):
        if c == "id":
            continue
        prop = c[:-1] if c.endswith("_") and c[:-1] in _RESERVED_NODE else c
        if prop in keys:
            continue
        sets.append(f"SET n.`{prop}` = row[{i}]")
    return (f"UNWIND $batch AS row\n"
            f"MERGE (n{lbl} {{ {key_props} }})\n" + "\n".join(sets))


def merge_rel_statement(rtype, keys, columns, meta_label=None) -> str:
    """UNWIND-batched MERGE for one relationship table: endpoints matched
    by the transient meta property stamped during the node pass."""
    lbl = f":`{meta_label}`" if meta_label else ""
    key_props = ", ".join(
        f"`{k}`: row[{columns.index(prop_phys(k, _RESERVED_REL))}]"
        for k in sorted(keys))
    key_str = f" {{ {key_props} }}" if key_props else ""
    sets = []
    for i, c in enumerate(columns):
        if c in ("id", "source", "target"):
            continue
        prop = c[:-1] if c.endswith("_") and c[:-1] in _RESERVED_REL else c
        if prop in keys:
            continue
        sets.append(f"SET rel.`{prop}` = row[{i}]")
    body = "\n".join(sets)
    return (f"UNWIND $batch AS row\n"
            f"MATCH (from{lbl} {{`{META_PROP}`: "
            f"row[{columns.index('source')}]}})\n"
            f"MATCH (to{lbl} {{`{META_PROP}`: "
            f"row[{columns.index('target')}]}})\n"
            f"MERGE (from)-[rel:`{rtype}`{key_str}]->(to)"
            + (f"\n{body}" if body else ""))


def merge_index_statements(node_keys, meta_label=None) -> list:
    """Constraint/index DDL that speeds the merge up
    (Neo4jGraphMerge.createIndexes)."""
    out = []
    for label, keys in sorted(node_keys.items()):
        props = ", ".join(f"n.`{k}`" for k in sorted(keys))
        out.append(f"CREATE CONSTRAINT ON (n:`{label}`) "
                   f"ASSERT ({props}) IS NODE KEY")
        out.append(f"CREATE INDEX ON :`{label}`(`{META_PROP}`)")
    if meta_label:
        out.append(f"CREATE INDEX ON :`{meta_label}`(`{META_PROP}`)")
    return out


def merge_graph(graph: PropertyGraph, uri: str, auth, node_keys: dict,
                rel_keys: dict | None = None, database: str = "neo4j",
                batch_size: int = 1000,
                meta_label: str | None = None) -> None:  # pragma: no cover
    """Merge ``graph`` into an existing Neo4j database: nodes first (each
    stamped with the transient ``__cfas_id`` match key), then
    relationships matched through it, then the key removed — the
    reference's three-phase merge (Neo4jGraphMerge.scala:117-157).

    ``node_keys``: {label: {prop, ...}} uniquely identifying a node per
    label (at least one label of every combo must have keys).  Runs
    distributed: every table partition opens its own bolt session and
    streams UNWIND batches.
    """
    _require_driver()
    rel_keys = rel_keys or {}

    def run_partition(stmt):
        def write(rows):
            from neo4j import GraphDatabase
            drv = GraphDatabase.driver(uri, auth=auth)
            with drv.session(database=database) as s:
                batch = []
                for row in rows:
                    batch.append(list(row))
                    if len(batch) >= batch_size:
                        s.run(stmt, batch=batch).consume()
                        batch = []
                if batch:
                    s.run(stmt, batch=batch).consume()
            drv.close()
        return write

    for combo, df in graph.node_tables.items():
        key_label = next((l for l in sorted(combo) if l in node_keys), None)
        if key_label is None:
            raise ValueError(f"no node key for label combination "
                             f"{sorted(combo)}")
        stmt = merge_node_statement(combo, node_keys[key_label],
                                    df.columns, meta_label)
        df.foreachPartition(run_partition(stmt))
    for rtype, df in graph.rel_tables.items():
        stmt = merge_rel_statement(rtype, rel_keys.get(rtype, set()),
                                   df.columns, meta_label)
        df.foreachPartition(run_partition(stmt))
    from neo4j import GraphDatabase
    drv = GraphDatabase.driver(uri, auth=auth)
    lbl = f":`{meta_label}`" if meta_label else ""
    with drv.session(database=database) as s:
        s.run(f"MATCH (n{lbl}) REMOVE n.`{META_PROP}`").consume()
    drv.close()
