"""Training-data and auxiliary operator families:

dedup        — exact, minhash-LSH, simhash, ngram-Jaccard, embedding-cosine
similarity   — brute-force cosine top-k, random-hyperplane LSH ANN
text         — lang-id, quality scoring, token counts, fingerprints
multimodal   — binary payload plumbing (Arrow mapInPandas, stubbed decode)
geo          — point-in-polygon join, kNN tile-neighbor lookup
angles       — POSSOL sun angles, TOA reflectance
inventory    — zero-check, inverted value index, corners, resample join
relational   — TPC-H-style agg/join/top-k/window/anti-join
"""
