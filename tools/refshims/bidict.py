"""Minimal bidict shim for importing the reference library in tests."""


class bidict(dict):
    @property
    def inverse(self):
        return {v: k for k, v in self.items()}
