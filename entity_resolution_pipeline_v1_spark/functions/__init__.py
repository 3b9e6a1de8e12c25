from . import embedder, hashing, similarity, sketches, text, years  # noqa: F401
