"""copperhead_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Run3HmmAnalysis/copperhead.

Built Spark-first: the data plane is the DataFrame/SQL API (Catalyst +
Tungsten pick the physical strategy); Pandas UDFs only where built-ins
genuinely can't express the semantics (batched ML inference, irregular
multi-table lookups).  See SURVEY.md for the operator-by-operator mapping
to the reference (citations are into /root/reference).

Layout:
    session      SparkSession bootstrap tuned for local[N] and cluster use
    catalog      table loading/registration over the testdata star schema
    functions/   scalar/aggregate expression libraries (exact sums, physics
                 kinematics, text analysis, vector math)
    operators/   composite operators (pairing, binned-lookup joins, weights
                 ledger, histogram aggregate, dedup, similarity, as-of)
    sources/     parquet partitioned scan/sink helpers, ROOT ingestion stub
    plans/       the registered query inventory (queries + DuckDB oracles)
    streaming/   Structured Streaming operators over the events table
    ml/          batched model inference (pandas UDF, fold routing)
"""

__version__ = "0.1.0"
