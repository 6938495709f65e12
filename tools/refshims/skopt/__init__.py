"""Minimal scikit-optimize shim (reference imports it at module load)."""

from types import SimpleNamespace


def gp_minimize(func, dimensions, n_calls=20, **kw):
    xs = [[(d.low + d.high) / 2 if hasattr(d, "low") else 0 for d in dimensions]]
    ys = [func(xs[0])]
    return SimpleNamespace(x=xs[0], fun=ys[0])


class _Space:
    def __init__(self, low, high, name=None):
        self.low, self.high, self.name = low, high, name


Real = Integer = _Space

utils = SimpleNamespace(
    use_named_args=lambda dims: (
        lambda f: (lambda x: f(**{d.name: v for d, v in zip(dims, x)}))
    )
)
