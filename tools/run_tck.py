"""Run the Gherkin TCK corpus standalone and print the coverage report.

    python tools/run_tck.py [features_dir]

Whitelisted scenarios must pass; blacklisted scenarios must KEEP failing
(a passing blacklisted scenario is reported as an error, mirroring
morpheus-tck/.../TckSparkCypherTest.scala:70-81).  Exit code 0 iff the
whole contract holds.  Drop the published openCypher TCK ``.feature``
files into ``tests/tck/features`` and they run unchanged.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "tck")
    features = sys.argv[1] if len(sys.argv) > 1 \
        else os.path.join(here, "features")
    blacklists = {
        name: os.path.join(here, "blacklists", f"{name}_blacklist")
        for name in ("failing", "wont_fix", "temporal", "failure_reporting")
        if os.path.exists(os.path.join(here, "blacklists",
                                       f"{name}_blacklist"))}

    from pyspark.sql import SparkSession

    from cypher_for_apache_flink_spark.tck import TckSuite
    from cypher_for_apache_flink_spark.tck.runner import run_scenario

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    suite = TckSuite(features, blacklists)
    failures = []
    for feat, sc in suite.white_list:
        try:
            run_scenario(spark, sc, background=feat.background)
        except Exception as e:
            failures.append(f"WHITELIST FAIL {sc}: "
                            f"{type(e).__name__}: {str(e)[:200]}")
    for feat, sc in suite.black_list:
        try:
            run_scenario(spark, sc, background=feat.background)
        except Exception:
            continue
        failures.append(f"BLACKLISTED SCENARIO PASSES (remove from "
                        f"blacklist): {sc}")
    failures.extend(f"STALE BLACKLIST ENTRY: {ln}"
                    for ln in suite.stale_blacklist_entries())

    print(suite.coverage_report())
    for f in failures:
        print(f, file=sys.stderr)
    print(f"{len(failures)} contract violations")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
