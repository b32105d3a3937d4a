"""Cross-modal encoder tests: valid-vocab maps, text/image embedding
shapes + properties, text<->image scoring end-to-end (random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.models.valid_vocab import (LID2VID, VALID_TOKEN_IDS,
                                            VID2LID, invalid_token_ids)


def test_valid_vocab_counts():
    assert len(VALID_TOKEN_IDS) == 27623
    assert len(invalid_token_ids()) == 2899
    assert len(VALID_TOKEN_IDS) + len(invalid_token_ids()) == 30522
    # maps invert each other
    assert LID2VID[VID2LID[100]] == 100
    # known exclusions: specials 0-998, unused 1067-1995, tail suffixes
    inv = set(invalid_token_ids().tolist())
    assert 0 in inv and 998 in inv and 1500 in inv and 30000 in inv
    assert 999 not in inv and 2000 not in inv


@pytest.fixture(scope="module")
def text_encoder():
    from vsearch_tpu.models.crossmodal_text import (VDRTextEncoder,
                                                    VDRTextEncoderConfig)

    tok = make_tokenizer()
    cfg = VDRTextEncoderConfig(bert=tiny_bert_config(tok.vocab_size),
                               max_len=32, topk=16)
    return VDRTextEncoder(cfg, tokenizer=tok)


def test_text_embed_normalized_topk(text_encoder):
    emb = text_encoder.embed(["green tea", "red planet mars"],
                             batch_size=2)
    assert emb.shape[0] == 2
    assert emb.shape[1] == text_encoder.config.out_dim
    # mandatory L2 norm happens before masking: norm of full emb is 1,
    # masked emb norm <= 1
    norms = np.linalg.norm(emb, axis=1)
    assert (norms <= 1.0 + 1e-5).all() and (norms > 0.1).all()
    assert (emb >= 0).all()


def test_text_bow_valid_space(text_encoder):
    bow = text_encoder.embed(["green tea"], bow=True)
    assert bow.shape[1] == text_encoder.config.out_dim
    assert set(np.unique(bow)) <= {0.0, 1.0}
    assert bow.sum() > 0


def test_text_disentangle(text_encoder):
    d = text_encoder.dst("green tea", topk=8)
    assert len(d) > 0
    assert all(v > 0 for v in d.values())


@pytest.fixture(scope="module")
def image_encoder():
    from vsearch_tpu.models.crossmodal_image import (VDRImageEncoder,
                                                     VDRImageEncoderConfig)

    tok = make_tokenizer()
    cfg = VDRImageEncoderConfig(resolution=64, patch_size=16, width=32,
                                layers=2, heads=2, topk=16,
                                num_valid_tokens=tok.vocab_size - 5)
    return VDRImageEncoder(cfg, tokenizer=tok)


def test_image_embed_from_array(image_encoder, rng):
    pixels = rng.random((2, 64, 64, 3)).astype(np.float32)
    emb = image_encoder.embed(pixels)
    assert emb.shape == (2, image_encoder.config.out_dim)
    assert ((emb != 0).sum(axis=1) <= 16).all()
    assert (emb >= 0).all()


def test_image_embed_from_pil(image_encoder, rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img = Image.fromarray(
        (rng.random((100, 80, 3)) * 255).astype(np.uint8))
    emb = image_encoder.embed(img)
    assert emb.shape == (1, image_encoder.config.out_dim)


def test_crossmodal_scoring(image_encoder, text_encoder, rng):
    """text emb @ image emb works when dims line up (shared tiny vocab)."""
    pixels = rng.random((2, 64, 64, 3)).astype(np.float32)
    img_emb = image_encoder.embed(pixels)
    txt_emb = text_encoder.embed(["green tea drink"])
    assert img_emb.shape[1] == txt_emb.shape[1]
    scores = txt_emb @ img_emb.T
    assert scores.shape == (1, 2)
    assert np.isfinite(scores).all()


def test_image_preprocess_shapes(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from vsearch_tpu.models.crossmodal_image import preprocess_image

    img = Image.fromarray(
        (rng.random((300, 500, 3)) * 255).astype(np.uint8))
    out = preprocess_image(img, resolution=224)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
