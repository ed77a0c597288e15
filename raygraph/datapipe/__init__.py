"""Large-scale training-data operators (first-class alongside the graph ops):

dedup.py       exact, MinHash+LSH, SimHash, n-gram Jaccard
similarity.py  brute-force cosine top-k + LSH-bucketed ANN over embeddings
text.py        language-ID, quality scoring, token counting, fingerprints
windows.py     tumbling/sliding windowed aggregates, as-of join
media.py       multimodal binary columns: decode/feature plumbing (stubbed codecs)
"""
