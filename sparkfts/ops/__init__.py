"""Large-scale training-data pipeline operators (engine extensions).

Beyond the reference's own search surface, a 100 TB webtext engine needs
the standard corpus-curation operators: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), embedding similarity search (brute-force +
LSH-bucketed ANN), text analysis (language id, quality scoring, token
counting, fingerprinting), and multimodal binary-column plumbing.

Every operator here is (a) expressed with built-in DataFrame functions
where possible (JVM-side, codegen'd) and (b) paired with an ANSI-SQL
oracle in ``__spark_entry__.oracle_sql`` so the driver cross-checks it
against DuckDB. Hash functions are chosen to be bit-identical across
Spark and DuckDB (md5-hex -> int64, 31-bit modular arithmetic).
"""
