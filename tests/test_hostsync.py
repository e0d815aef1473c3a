"""PipelinedFetcher: one-step-delayed host fetches used by every epoch loop.

The fetcher must deliver EXACTLY the values the eager loop saw, in the same
order — only the wall-clock interleaving may change."""
import jax.numpy as jnp
import numpy as np

from adaptpoint_tpu.utils import PipelinedFetcher


def test_order_and_values_match_eager():
    seen = []
    fetch = PipelinedFetcher()
    for i in range(7):
        out = (jnp.asarray(i, jnp.float32), jnp.full((2,), i))
        fetch.push(out, lambda o, idx: seen.append((idx, float(o[0]),
                                                    o[1].copy())), i)
        # at most one step is ever pending
        assert len(seen) == i
    fetch.flush()
    assert [s[0] for s in seen] == list(range(7))
    for idx, scalar, arr in seen:
        assert scalar == idx
        np.testing.assert_array_equal(arr, np.full((2,), idx))


def test_fetched_leaves_are_numpy():
    got = {}
    fetch = PipelinedFetcher()
    fetch.push({"a": jnp.ones((3,)), "b": jnp.zeros(())}, got.update)
    fetch.flush()
    assert isinstance(got["a"], np.ndarray) and got["a"].shape == (3,)
    assert float(got["b"]) == 0.0


def test_flush_empty_and_double_flush():
    fetch = PipelinedFetcher()
    fetch.flush()  # no-op
    calls = []
    fetch.push(jnp.asarray(1.0), lambda v: calls.append(float(v)))
    fetch.flush()
    fetch.flush()  # second flush must not re-process
    assert calls == [1.0]


def test_context_args_passed_through():
    rows = []
    fetch = PipelinedFetcher()
    for i, tag in enumerate(["x", "y"]):
        fetch.push(jnp.asarray(i), lambda v, t, j: rows.append((t, j, int(v))),
                   tag, i)
    fetch.flush()
    assert rows == [("x", 0, 0), ("y", 1, 1)]
