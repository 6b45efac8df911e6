"""Utility metrics tests (text metrics + penalty scheduler)."""

import numpy as np
import pytest

from speechclip_tpu.utils import (
    PenaltyScheduler,
    cer,
    corpus_bleu,
    edit_distance,
    ter,
    wer,
)


class TestEditDistance:
    def test_basic(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
        assert edit_distance([], [1, 2]) == 2

    def test_wer_cer(self):
        assert wer(["the cat sat"], ["the cat sat"]) == 0.0
        assert wer(["the cat sat"], ["the dog sat"]) == pytest.approx(1 / 3)
        assert cer(["abc"], ["axc"]) == pytest.approx(1 / 3)
        assert ter([[1, 2, 3, 4]], [[1, 2, 4]]) == pytest.approx(1 / 4)


class TestBleu:
    def test_perfect_match(self):
        assert corpus_bleu(["the cat sat on the mat"], ["the cat sat on the mat"]) == pytest.approx(100.0)

    def test_no_match(self):
        assert corpus_bleu(["aa bb cc dd"], ["xx yy zz ww"]) == 0.0

    def test_partial(self):
        score = corpus_bleu(
            ["the cat sat on the mat today"], ["the cat sat on a mat today"]
        )
        assert 0 < score < 100


class TestPenaltyScheduler:
    def test_interpolation(self):
        sched = PenaltyScheduler(weights=[0.0, 1.0, 0.5], keypoints=[0, 10, 20])
        assert sched.get_value(0) == 0.0
        assert sched.get_value(5) == pytest.approx(0.5)
        assert sched.get_value(10) == pytest.approx(1.0)
        assert sched.get_value(15) == pytest.approx(0.75)
        assert sched.get_value(100) == 0.5

    def test_traced_matches_python(self):
        sched = PenaltyScheduler(weights=[0.0, 1.0, 0.5], keypoints=[0, 10, 20])
        for step in [0, 3, 10, 17, 25]:
            np.testing.assert_allclose(
                float(sched.get_value_traced(step)), sched.get_value(step), atol=1e-6
            )
