"""vsearch-tpu: a TPU-native lexical/sparse retrieval framework.

Re-implements the capabilities of jzhoubu/vsearch (VDR / SVDR) from
scratch in idiomatic JAX/XLA/Pallas: vocabulary-space bi-encoders, dense /
sparse / bag-of-token indexes with fused top-k search, semi-parametric
alpha/beta retrieval, contrastive training over TPU meshes.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level exports (keep `import vsearch_tpu` light)
    if name in ("Retriever", "RetrieverConfig"):
        from . import retriever
        return getattr(retriever, name)
    if name in ("BiEncoder", "BiEncoderConfig"):
        from . import biencoder
        return getattr(biencoder, name)
    raise AttributeError(name)

