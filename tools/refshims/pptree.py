"""Minimal pptree shim."""


def print_tree(*a, **k):
    pass


class Node:
    def __init__(self, name, parent=None):
        self.name = name
        self.parent = parent
