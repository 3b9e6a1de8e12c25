from . import (  # noqa: F401
    blocking,
    classify,
    cluster,
    dedup,
    extract,
    features,
    impute,
    multimodal,
    pairs,
    preprocess,
    simsearch,
)
