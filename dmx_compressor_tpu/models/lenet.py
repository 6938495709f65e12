"""LeNet-5: the minimum end-to-end co-design slice.

Mirrors the reference's LeNet test vehicle (reference:
tests/test_transforms.py, configs/dmx_example_config_lenet5.yaml): module
names conv1/mp1/conv2/mp2/fc1/fc2/fc3 match the reference config keys so the
shipped yaml applies unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from .. import rawnn
from ..nn import modules as dmxnn


class LeNet5(nnx.Module):
    """Classic LeNet-5 over 1x28x28 (NCHW) inputs."""

    def __init__(self, num_classes: int = 10, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(1, 6, (5, 5), padding=((2, 2), (2, 2)), rngs=rngs)
        self.relu1 = rawnn.ReLU()
        self.mp1 = dmxnn.MaxPool2d(2, 2)
        self.conv2 = nnx.Conv(6, 16, (5, 5), padding="VALID", rngs=rngs)
        self.relu2 = rawnn.ReLU()
        self.mp2 = dmxnn.MaxPool2d(2, 2)
        self.fc1 = nnx.Linear(400, 120, rngs=rngs)
        self.relu3 = rawnn.ReLU()
        self.fc2 = nnx.Linear(120, 84, rngs=rngs)
        self.relu4 = rawnn.ReLU()
        self.fc3 = nnx.Linear(84, num_classes, rngs=rngs)

    def __call__(self, x):
        # x: [B, 1, 28, 28]
        h = self.conv1(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h = self.mp1(self.relu1(h))
        h = self.conv2(h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        h = self.mp2(self.relu2(h))
        h = h.reshape(h.shape[0], -1)
        h = self.relu3(self.fc1(h))
        h = self.relu4(self.fc2(h))
        return self.fc3(h)
