"""Round-12 §1 probe: is word_shingles' per-element lambda re-evaluating
the tokens() subtree (regex split) per transform element?

Times three expression variants over the sf0.1 documents corpus with the
noop sink (guide §1.4), checking result equality cell-by-cell first.

Usage: python tools/probes/shingle_microbench.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def variant_current(text, n=3):
    """The shipped word_shingles (tokens subtree inside the lambda)."""
    from cypher_for_apache_flink_spark.functions.text import tokens
    toks = tokens(text)
    cnt = F.size(toks) - (n - 1)
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n))))
    return F.when(cnt > 0, grams).otherwise(F.array().cast("array<string>"))


def variant_let_bound(text, n=3):
    """Same expression, but tokens() bound ONCE via a single-element
    transform so the inner lambda references a lambda variable."""
    from cypher_for_apache_flink_spark.functions.text import tokens

    def grams_of(tks):
        cnt = F.size(tks) - (n - 1)
        g = F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tks, i, n))))
        return F.when(cnt > 0, g).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(tokens(text)), grams_of)[0]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- equality first -------------------------------------------------
    both = docs.select(
        "doc_id",
        variant_current(F.col("text")).alias("cur"),
        variant_let_bound(F.col("text")).alias("new"))
    diff = both.where(~(F.col("cur") == F.col("new"))
                      | F.col("cur").isNull() != F.col("new").isNull()).count()
    print(f"rows with differing shingle arrays: {diff}")
    assert diff == 0, "variants disagree!"

    # --- timing ---------------------------------------------------------
    def bench(label, col):
        df = docs.select(F.explode(col).alias("sh"))
        # warm
        df.write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(3):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(f"{label}: {sorted(ts)[1]:.3f}s (runs: "
              + ", ".join(f"{t:.3f}" for t in ts) + ")")

    bench("current  (subtree in lambda)", variant_current(F.col("text")))
    bench("let-bound (single-elem xform)", variant_let_bound(F.col("text")))
    spark.stop()


if __name__ == "__main__":
    main()
