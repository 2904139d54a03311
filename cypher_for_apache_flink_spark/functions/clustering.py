"""Distributed k-means clustering over embedding columns.

The training-data-pipeline use case: bucket a corpus's embedding space
into k groups (topic balancing, dedup stratification, mixture control)
without leaving the DataFrame API.  The reference has no clustering
surface at all; this is the same "extension users reached for MLlib for"
slot the graph algorithms fill (SURVEY §2.3 negative space).

Design notes (100-TB shape):

- Lloyd's algorithm with k centroids broadcast as column literals:
  the assignment step is a pure column expression (zip_with + aggregate
  over the vector array), no join and no shuffle at all.
- The update step is ONE groupBy("cluster") with per-dimension sums --
  map-side combinable to k rows x dims columns, so the shuffle is k
  rows regardless of corpus size.
- The only driver-side state is the k x dims centroid matrix itself
  (same bounded-collect class as the IVF seeding in
  functions/similarity.py:112), refreshed once per iteration.

Determinism / oracle-exactness: arithmetic runs on an INTEGER lattice --
vectors are quantized to round(x * scale) int64 once up front, distances
are integer sums of squares, and centroid updates floor-divide in exact
INTEGER arithmetic on both sides (Python ``//`` in the engine; a
remainder-adjusted integer division in the SQL twin -- a double
``FLOOR(sum/count)`` would round across the floor boundary once
per-cluster sums approach 2^53).  Every engine computes bit-identical
results, so a plain ANSI-SQL oracle hash-matches
(:func:`kmeans_sql_oracle`).  Initial centroids are the k rows with the
smallest ids -- no RNG anywhere.
"""
from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(vec: Column, scale: int) -> Column:
    """round(x * scale) as long -- exact on the integer lattice."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * F.lit(float(scale)), 0)
        .cast("long"))


def _sq_dist(vec: Column, centroid: list[int]) -> Column:
    """Integer sum of squared differences against a literal centroid."""
    lit = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _dist_array(vec: Column, centroids: list[list[int]]) -> Column:
    """Array of integer squared distances to EVERY centroid, in centroid
    order -- ONE ``transform`` lambda over a 2-D centroid literal that
    Catalyst constant-folds into a single Literal value (round 10,
    VERDICT r9 #6).  The round-9 form unrolled k separate
    aggregate-over-zip_with expressions, so the Catalyst tree (and the
    generated code) grew O(k x dims) COMPUTE nodes: k=64/dims=64
    measured ~66 s of pure planning/codegen on a 300-row input.  Here
    the compute subtree is O(1) regardless of k, and the 2-D literal is
    parsed from ONE SQL string (per-element ``F.lit`` Column objects
    cost a py4j round-trip each -- ~11 s for 4096 cells; ``F.expr``
    parses the same array-of-arrays JVM-side in milliseconds).
    Evaluation is k runtime iterations of the lambda per row, identical
    arithmetic on the integer lattice, so results are bit-identical to
    the unrolled form."""
    lit2d = "array(" + ",".join(
        "array(" + ",".join(f"{int(c)}L" for c in cc) + ")"
        for cc in centroids) + ")"
    return F.transform(F.expr(lit2d), lambda c: F.aggregate(
        F.zip_with(vec, c, lambda a_, b_: (a_ - b_) * (a_ - b_)),
        F.lit(0).cast("long"), lambda acc, x: acc + x))


def kmeans(df: DataFrame, k: int = 8, iterations: int = 4,
           id_col: str = "vec_id", vec_col: str = "embedding",
           scale: int = 1000) -> tuple[DataFrame, list[list[int]]]:
    """Integer-lattice Lloyd's k-means.  Returns ``(assignments,
    centroids)`` where assignments is (id, cluster, sq_dist) -- one row
    per input vector with its final cluster (ties broken toward the
    lowest cluster index) and the integer squared distance to that
    centroid -- and centroids is the final k x dims matrix (quantized
    units).

    Initial centroids are the quantized vectors of the k smallest ids.
    Empty clusters keep their previous centroid.  ``scale`` sets the
    lattice resolution (1000 ~ 3 decimal digits of the input floats).
    """
    if k < 1:
        raise ValueError("kmeans: k must be >= 1")
    q = df.select(F.col(id_col).alias("id"),
                  _quantize(F.col(vec_col), scale).alias("q"))
    # iterated over; cache once -- the input scan happens exactly once
    q = q.persist()
    try:
        seed_rows = (q.orderBy("id").limit(k).collect())
        if len(seed_rows) < k:
            raise ValueError(
                f"kmeans: k={k} exceeds the {len(seed_rows)} input rows")
        dims = len(seed_rows[0]["q"])
        centroids = [list(r["q"]) for r in seed_rows]

        def assign(frame: DataFrame) -> DataFrame:
            dists = _dist_array(F.col("q"), centroids)
            return frame.select(
                "id", "q", dists.alias("__d"),
                (F.array_position(dists, F.array_min(dists)) - 1)
                .cast("int").alias("cluster"))

        assigned = None
        for _ in range(iterations):
            assigned = assign(q)
            # ONE shuffle to k x dims rows: the update step is a NARROW
            # posexplode + (cluster, pos) sum instead of the former
            # 64-column-wide aggregate (round 12) — the wide plan cost
            # ~0.5s of per-iteration planning/codegen for 3 columns of
            # real data (measured: the query dropped 4.0-4.8s -> 2.1-2.7s
            # at sf0.1 with bit-identical centroids,
            # tools/probes/kmeans_update_variants.py).  Still map-side
            # combinable to k*dims rows per partition; the per-element
            # hash-agg overhead is bounded by the assignment step's
            # k*dims distance arithmetic, which dominates per-row cost
            # at any scale.
            sums = (assigned.select("cluster",
                                    F.posexplode("q").alias("pos", "x"))
                    .groupBy("cluster", "pos")
                    .agg(F.sum("x").alias("s"),
                         F.count(F.lit(1)).alias("n")))
            rows = sums.collect()  # bounded: k * dims rows
            # floor division semantics must match the oracle's
            # FLOOR(sum/count): Python's // already floors
            new: dict[int, list[int]] = {}
            for r in rows:
                new.setdefault(int(r["cluster"]), [0] * dims)
            for r in rows:
                new[int(r["cluster"])][int(r["pos"])] = \
                    int(r["s"]) // int(r["n"])
            centroids = [new.get(j, centroids[j]) for j in range(k)]
        final = assign(q).select(
            "id", "cluster",
            F.array_min(F.col("__d")).alias("sq_dist"))
        return final, centroids
    finally:
        q.unpersist()


def kmeans_summary(df: DataFrame, k: int = 8, iterations: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 1000) -> DataFrame:
    """Per-cluster rollup of :func:`kmeans`: (cluster, size, inertia)
    where inertia is the integer sum of squared distances -- the usual
    Lloyd's objective, exact on the lattice."""
    assigned, _ = kmeans(df, k=k, iterations=iterations, id_col=id_col,
                         vec_col=vec_col, scale=scale)
    return (assigned.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("size"),
                 F.sum("sq_dist").alias("inertia")))


def kmeans_sql_oracle(emb_sql: str, k: int = 8, iterations: int = 4,
                      dims: int = 64, scale: int = 1000) -> str:
    """ANSI-SQL twin of :func:`kmeans_summary` -- Lloyd's unrolled to
    ``iterations`` CTE blocks, exact on the same integer lattice.

    ``emb_sql`` selects (vec_id, embedding).  Assignment = argmin of the
    integer squared distance (ties to the lowest cluster index, matching
    array_position's first-occurrence pick); update = exact integer
    floor division per dimension (``(sum - ((sum % n) + n) % n) // n``:
    the numerator is an exact multiple of n, so integer division is
    exact regardless of the engine's truncation direction -- a double
    ``FLOOR(sum * 1.0 / n)`` diverges from Python's ``//`` once sums
    reach ~2^53, verified at 2^55+1 / 3) with empty clusters keeping
    the previous centroid.  Position indexing replaces zip_with: a
    dims-row ordinal table joined cross-wise, 1-indexed list access."""
    blocks = [f"""
emb AS ({emb_sql}),
q AS (SELECT vec_id AS id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * {scale}, 0)
                                      AS BIGINT)) AS q
      FROM emb),
dims AS (SELECT CAST(i AS INT) AS i FROM range({dims}) t(i)),
cent_0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT)
                    AS cluster, q
           FROM (SELECT id, q FROM q ORDER BY id LIMIT {k}))"""]
    for t in range(iterations):
        blocks.append(f"""
dist_{t} AS (SELECT v.id, c.cluster,
                    sum((v.q[d.i + 1] - c.q[d.i + 1])
                        * (v.q[d.i + 1] - c.q[d.i + 1])) AS sq
             FROM q v CROSS JOIN cent_{t} c CROSS JOIN dims d
             GROUP BY v.id, c.cluster),
assign_{t} AS (SELECT id, cluster, sq
               FROM (SELECT id, cluster, sq,
                            row_number() OVER (PARTITION BY id
                                               ORDER BY sq, cluster) AS rn
                     FROM dist_{t})
               WHERE rn = 1),
cent_{t + 1} AS (
  SELECT p.cluster,
         COALESCE(u.q, p.q) AS q
  FROM cent_{t} p LEFT JOIN (
    SELECT cluster, list(val ORDER BY i) AS q
    FROM (SELECT a.cluster, d.i,
                 CAST((sum(v.q[d.i + 1])
                       - ((sum(v.q[d.i + 1]) % count(*)) + count(*))
                         % count(*)) // count(*) AS BIGINT) AS val
          FROM assign_{t} a JOIN q v USING (id) CROSS JOIN dims d
          GROUP BY a.cluster, d.i)
    GROUP BY cluster) u ON u.cluster = p.cluster)""")
    blocks.append(f"""
dist_final AS (SELECT v.id, c.cluster,
                      sum((v.q[d.i + 1] - c.q[d.i + 1])
                          * (v.q[d.i + 1] - c.q[d.i + 1])) AS sq
               FROM q v CROSS JOIN cent_{iterations} c CROSS JOIN dims d
               GROUP BY v.id, c.cluster),
assign_final AS (SELECT id, cluster, sq
                 FROM (SELECT id, cluster, sq,
                              row_number() OVER (PARTITION BY id
                                                 ORDER BY sq, cluster) AS rn
                       FROM dist_final)
                 WHERE rn = 1)""")
    return ("WITH " + ",".join(blocks) + """
SELECT cluster, count(*) AS size, CAST(sum(sq) AS BIGINT) AS inertia
FROM assign_final GROUP BY cluster""")


def kmeans_assign(df: DataFrame, centroids: list[list[int]],
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale: int = 1000) -> DataFrame:
    """Assign NEW vectors to existing :func:`kmeans` centroids -- the
    incremental-ingestion path (cluster a batch against yesterday's
    model without refitting).  Returns (id, cluster, sq_dist) with the
    same quantization, tie-break, and distance lattice as training, so
    a vector identical to a training row lands in the same cluster.
    Pure column expressions against broadcast centroid literals: no
    join, no shuffle, safe inside foreachBatch."""
    if not centroids:
        raise ValueError("kmeans_assign: centroids must be non-empty")
    q = df.select(F.col(id_col).alias("id"),
                  _quantize(F.col(vec_col), scale).alias("q"))
    dists = _dist_array(F.col("q"), centroids)
    return q.select(
        "id",
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int").alias("cluster"),
        F.array_min(dists).alias("sq_dist"))
