"""Large-scale training-data pipeline operators (the north-star extensions,
SURVEY.md §7 step 8): deduplication, similarity search, text analysis, and
multimodal column plumbing. These generalize the reference's own machinery —
MinHash/n-gram dedup generalizes the trigram index (F1/F10/F12), vector
top-k generalizes radius/top-k (R3/G1) — to 100 TB corpora.
"""
