"""Training-data pipeline operators over the `documents` / `embeddings`
tables: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting, rolling-hash
fingerprints), and multimodal binary-column plumbing.

Everything relational is built-in DataFrame API (Catalyst optimizes);
signature computation (MinHash/SimHash/LSH projections) runs in vectorized
pandas/Arrow UDFs. Every deterministic operator carries a DuckDB oracle SQL
string colocated with its implementation so __spark_entry__ stays in sync.
"""
