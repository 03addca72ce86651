"""AOT cache payload deserialization is allowlist-restricted.

The disk cache holds ``{"blob": bytes, "out_treedef": PyTreeDef}``
pickles; a writable cache dir must not be an arbitrary-code-execution
primitive (ADVICE r4 + round-5 review: a name-based denylist is
bypassable via gadget functions like ``numpy.testing``'s ``runstring``,
so the loader allows only treedef machinery, closed builtin container
types, and this package's NamedTuple pytree nodes)."""

import pickle

import jax
import jax.numpy as jnp
import pytest

from niftymatch_tpu.features import Features
from niftymatch_tpu.ops.match import MatchResult
from niftymatch_tpu.utils.aot import _restricted_loads


def _payload_treedef():
    n = 4
    f = Features(
        *(jnp.zeros((n,)) for _ in range(7)),
        desc=jnp.zeros((n, 8)),
        valid=jnp.ones((n,), bool),
    )
    m = MatchResult(
        indices=jnp.zeros((n,), jnp.int32),
        distances=jnp.zeros((n,)),
        ratios=jnp.ones((n,)),
    )
    return jax.tree.structure((f, {"m": m, "x": (1, 2)}))


def test_real_payload_round_trips():
    td = _payload_treedef()
    out = _restricted_loads(
        pickle.dumps({"blob": b"\x00" * 16, "out_treedef": td})
    )
    assert out["out_treedef"] == td
    assert out["blob"] == b"\x00" * 16


class _NumpyGadget:
    def __reduce__(self):
        import numpy.testing._private.utils as u

        return (u.runstring, ("raise SystemExit('pwned')", {}))


class _OsGadget:
    def __reduce__(self):
        import os

        return (os.system, ("true",))


class _PackageFunctionGadget:
    # Even functions from THIS package must not resolve — only
    # NamedTuple pytree-node types do.
    def __reduce__(self):
        from niftymatch_tpu.utils import aot

        return (aot.cache_dir, ())


@pytest.mark.parametrize(
    "gadget", [_NumpyGadget(), _OsGadget(), _PackageFunctionGadget()]
)
def test_gadgets_refused(gadget):
    with pytest.raises(pickle.UnpicklingError, match="refusing"):
        _restricted_loads(pickle.dumps(gadget))
