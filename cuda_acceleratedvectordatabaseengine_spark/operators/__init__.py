"""Operator layer: k-NN search, k-means, IVF index, PQ, dedup families,
text analysis, ANN similarity search."""
