from .exact import cents_sum, to_cents
from .vector import cosine_similarity, dot, l2_norm_sq

__all__ = ["to_cents", "cents_sum", "dot", "l2_norm_sq", "cosine_similarity"]
