"""skopt.space shim: the reference only type-annotates with Space."""


class Space:  # pragma: no cover - annotation-only surface
    def __init__(self, dimensions=None):
        self.dimensions = dimensions or []


class Real:
    def __init__(self, low, high, name=None, **kw):
        self.low, self.high, self.name = low, high, name


class Integer(Real):
    pass
