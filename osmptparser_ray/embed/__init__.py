from .ann import cosine_near_dup, ivf_ann, ivf_build, knn_bruteforce, lsh_ann

__all__ = ["cosine_near_dup", "ivf_ann", "ivf_build", "knn_bruteforce", "lsh_ann"]
