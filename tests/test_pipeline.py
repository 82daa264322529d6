"""utils/pipeline.py: the one-deep dispatch/drain lag used by every
device-sweep loop (PPR, embed, kNN, rank eval)."""

from gcn_song_embeddings_tpu.utils.pipeline import lagged


def test_lagged_yields_everything_in_order():
    for n in (0, 1, 2, 7):
        assert list(lagged(iter(range(n)))) == list(range(n))


def test_lagged_runs_one_ahead():
    """The producer must be advanced exactly one element past the
    consumer (that lookahead is what overlaps copy-out with compute)."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = lagged(gen())
    assert next(it) == 0 and produced == [0, 1]
    assert next(it) == 1 and produced == [0, 1, 2]
    assert list(it) == [2, 3]
