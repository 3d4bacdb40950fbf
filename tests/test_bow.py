"""BoW vocabulary tree retrieval (DBoW2 role, slam/bow.py)."""
import numpy as np
import pytest

from lsd_tpu.slam.bow import (BinaryVocabulary, BowDatabase, bow_similarity,
                              hamming, _majority)


def synth_scenes(n_scenes=20, desc_per_scene=60, seed=3):
    """Each scene is a cluster of descriptors around distinct prototypes;
    views of the same scene share most bits."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(0, 256, (n_scenes, 8, 32), dtype=np.uint8)
    def view(s):
        base = protos[s][rng.integers(0, 8, desc_per_scene)]
        noise = (rng.random((desc_per_scene, 32, 8)) < 0.02)
        flip = np.packbits(noise, axis=-1).reshape(desc_per_scene, 32)
        return np.bitwise_xor(base, flip)
    return view


class TestHammingMath:
    def test_hamming(self):
        a = np.zeros((1, 32), np.uint8)
        b = np.full((1, 32), 255, np.uint8)
        assert hamming(a, a)[0, 0] == 0
        assert hamming(a, b)[0, 0] == 256

    def test_majority(self):
        d = np.asarray([[0b11110000] * 32, [0b11110000] * 32,
                        [0b00001111] * 32], np.uint8)
        assert (_majority(d) == 0b11110000).all()


class TestVocabulary:
    def test_words_stable_and_discriminative(self):
        view = synth_scenes()
        train = np.concatenate([view(s) for s in range(20)], axis=0)
        vocab = BinaryVocabulary(branching=6, levels=3).fit(train)
        assert vocab.n_words > 20
        # two views of the same scene share far more words than views of
        # different scenes
        a1, a2, b1 = view(0), view(0), view(7)
        sim_same = bow_similarity(vocab.bow(a1), vocab.bow(a2))
        sim_diff = bow_similarity(vocab.bow(a1), vocab.bow(b1))
        assert sim_same > 2 * sim_diff


class TestDatabase:
    def test_retrieval_ranks_true_scene_first(self):
        view = synth_scenes()
        train = np.concatenate([view(s) for s in range(20)], axis=0)
        vocab = BinaryVocabulary(branching=6, levels=3).fit(train)
        db = BowDatabase(vocab)
        for s in range(20):
            db.add(s, view(s))
        hits = 0
        for s in range(20):
            ranked = db.query(view(s), top_k=3)
            if ranked and ranked[0][0] == s:
                hits += 1
        assert hits >= 18

    def test_inverted_index_sublinear(self):
        view = synth_scenes(n_scenes=30)
        train = np.concatenate([view(s) for s in range(30)], axis=0)
        vocab = BinaryVocabulary(branching=6, levels=3).fit(train)
        db = BowDatabase(vocab)
        for s in range(30):
            db.add(s, view(s))
        out = db.query(view(4), top_k=5)
        assert len(out) <= 5 and out[0][1] > 0


class TestVisualRelocBow:
    def test_bow_index_kicks_in(self):
        cv2 = pytest.importorskip("cv2")
        from lsd_tpu.slam.visual_reloc import VisualRelocDB
        rng = np.random.default_rng(1)
        db = VisualRelocDB(bow_threshold=5)
        imgs = []
        for k in range(8):
            img = (rng.random((120, 160)) * 255).astype(np.uint8)
            img = cv2.resize(img, (320, 240), interpolation=cv2.INTER_NEAREST)
            ok, buf = cv2.imencode(".jpg", img)
            imgs.append(buf.tobytes())
            db.add(k, buf.tobytes())
        hits = db.query(imgs[3], top_k=2, min_matches=10)
        # index was built lazily on query past the threshold
        assert db._bow_db is not None
        assert hits and hits[0][0] == 3
