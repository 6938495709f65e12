"""Plugin hooks invoked from every DmxModule forward.

TPU-native port of the reference plugin system
(reference: src/dmx/compressor/plugins.py).  Plugins observe each layer's
before/after-cast tensors (e.g. for error telemetry or logging) and may apply
input-independent model transforms on activation.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Dict, Tuple


@dataclass
class PluginLayerData:
    """Per-layer data handed to plugins (reference plugins.py:9-21)."""

    input_before_cast: Any = None
    input_after_cast: Any = None
    output_before_cast: Any = None
    output_after_cast: Any = None
    mod: Any = None
    args: Tuple = ()
    kwargs: Dict = field(default_factory=dict)


class PluginBase:
    """Base plugin (reference plugins.py:24-43)."""

    def process_model(self, model) -> None:
        """Input-independent model transform, run on activation."""

    def process_layer(self, data: PluginLayerData) -> None:
        """Called from every DmxModule forward with layer tensors."""


class ActivatePlugins:
    """Context manager activating plugins on a model
    (reference plugins.py:46-62)."""

    def __init__(self, *plugins: PluginBase):
        self.plugins = list(plugins)

    @contextmanager
    def applied_to(self, model):
        from .nn.core import DmxModule

        for p in self.plugins:
            p.process_model(model)
        DmxModule.plugins = DmxModule.plugins + self.plugins
        try:
            yield model
        finally:
            DmxModule.plugins = [
                p for p in DmxModule.plugins if p not in self.plugins
            ]
