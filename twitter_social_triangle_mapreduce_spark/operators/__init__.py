from . import dedup, graph, multimodal, relational, similarity, text  # noqa: F401
