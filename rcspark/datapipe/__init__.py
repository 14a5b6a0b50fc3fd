"""Training-data pipeline operators over the documents/embeddings tables.

Beyond the reference's own crawl operators, a 100 TB crawl corpus needs the
standard curation toolchain; each op here is Spark-first (built-in exprs
where possible, Arrow-vectorized UDFs otherwise) and, where its semantics
are engine-independent and exact, ships a DuckDB oracle in
__spark_entry__.oracle_sql():

- hashing:    md5-derived 60-bit hashes computable identically in Spark SQL
              and DuckDB (the cross-engine determinism trick)
- text:       token counting, quality scoring, language-ID, fingerprinting
- dedupdocs:  exact dedup, MinHash+LSH, SimHash, n-gram Jaccard
- similarity: brute-force cosine top-k + LSH-bucketed ANN
- multimodal: binary image columns — decode/feature/resize plumbing
"""
