"""Large-scale training-data pipeline operators.

Beyond the reference's ETL surface: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search (brute-force
and IVF-style ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting) and multimodal binary-column plumbing — all
designed for 100 TB corpora (see each module's scale notes).
"""
