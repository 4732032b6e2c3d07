from .scalar import coalesce_str, json_get, topic_name
from .vector import cosine_similarity, dot, l2_norm

__all__ = ["topic_name", "json_get", "coalesce_str",
           "cosine_similarity", "dot", "l2_norm"]
