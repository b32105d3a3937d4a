"""Golden-score regression harness (reference test/quick_start.py:31-32).

The published reference checkpoints are the de-facto regression fixtures:
  svdr-nq "green tea" demo   -> [[88.3123, 23.9107, 12.7908, 12.5917]]
  svdr-msmarco relativity    -> [[97.2964, 39.7844, 37.6955]]
  vdr-cross-modal mars image -> [[0.3209, 0.0984]]

This environment has no network access to fetch those weights, so the
harness activates when a converted checkpoint is provided via
``VSEARCH_TPU_GOLDEN_CKPT=/path/to/svdr-nq`` (native or torch dir) —
and, for the cross-modal golden, ``VSEARCH_TPU_GOLDEN_CROSSMODAL=/path``
(the vdr-cross-modal dir) + ``VSEARCH_TPU_GOLDEN_IMAGE=/path/to/mars.png``
(the reference's example image); skipped otherwise. Conversion:
docs/CHECKPOINTS.md.
"""
import os

import numpy as np
import pytest

CKPT = os.environ.get("VSEARCH_TPU_GOLDEN_CKPT")
CROSSMODAL_CKPT = os.environ.get("VSEARCH_TPU_GOLDEN_CROSSMODAL")
CROSSMODAL_IMAGE = os.environ.get("VSEARCH_TPU_GOLDEN_IMAGE")

QUERY = "Who first proposed the theory of relativity?"
PASSAGES = [
    "Albert Einstein (14 March 1879 - 18 April 1955) was a German-born "
    "theoretical physicist, widely acknowledged to be one of the "
    "greatest and most influential physicists of all time. Einstein is "
    "best known for developing the theory of relativity, but he also "
    "made important contributions to the development of the theory of "
    "quantum mechanics.",
]

GREEN_TEA_QUERY = "What does green tea help with?"

needs_ckpt = pytest.mark.skipif(
    not CKPT, reason="set VSEARCH_TPU_GOLDEN_CKPT to a converted "
                     "svdr-nq checkpoint to run golden-score checks")
needs_crossmodal = pytest.mark.skipif(
    not (CROSSMODAL_CKPT and CROSSMODAL_IMAGE),
    reason="set VSEARCH_TPU_GOLDEN_CROSSMODAL + VSEARCH_TPU_GOLDEN_IMAGE "
           "to run the cross-modal golden check")


@needs_ckpt
def test_embed_scores_are_deterministic():
    from vsearch_tpu.retriever import Retriever

    ir = Retriever.from_pretrained(CKPT)
    q1 = ir.encoder_q.embed([QUERY])
    q2 = ir.encoder_q.embed([QUERY])
    np.testing.assert_allclose(q1, q2, rtol=1e-5)


@needs_ckpt
def test_relative_ranking_sanity():
    """Even without exact golden values, a converted checkpoint must
    rank the on-topic passage far above off-topic ones."""
    from vsearch_tpu.retriever import Retriever

    ir = Retriever.from_pretrained(CKPT)
    q = ir.encoder_q.embed([QUERY])
    p = ir.encoder_p.embed(PASSAGES + [
        "The Mars rover collected soil samples from the crater.",
        "Green tea is a popular beverage in East Asia.",
    ])
    scores = (q @ p.T)[0]
    assert scores[0] > scores[1] and scores[0] > scores[2]
    assert scores[0] > 2 * max(scores[1], scores[2])


@needs_crossmodal
def test_crossmodal_golden_scores():
    """Reference test/quick_start.py:34-45: the mars example image vs
    ['the mars', 'the sun'] must score [[0.3209, 0.0984]]."""
    from vsearch_tpu.retriever import Retriever

    ir = Retriever.from_pretrained(CROSSMODAL_CKPT)
    img_emb = ir.encoder_p.embed([CROSSMODAL_IMAGE])
    txt_emb = ir.encoder_q.embed(["the mars", "the sun"])
    scores = img_emb @ txt_emb.T
    np.testing.assert_allclose(scores, [[0.3209, 0.0984]], atol=5e-3)
