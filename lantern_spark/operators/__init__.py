"""Query operators: KNN, weighted search, BM25, PQ, IVF index, dedup, …"""
