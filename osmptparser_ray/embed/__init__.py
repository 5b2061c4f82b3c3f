from .ann import cosine_near_dup, knn_bruteforce, lsh_ann

__all__ = ["cosine_near_dup", "knn_bruteforce", "lsh_ann"]
