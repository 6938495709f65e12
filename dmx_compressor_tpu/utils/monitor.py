"""Monitoring and runtime measurement context managers.

TPU-native port of the reference's forward-hook-based tracing
(reference: src/dmx/compressor/modeling/nn/core.py:302-358 and
model.py:223-273).  Modules are wrapped (no hooks in nnx) with recorders that
capture input/output or wall-clock runtimes with device synchronization via
``block_until_ready`` — the TPU analogue of ``torch.cuda.Event``.  Note the
same caveat as the reference (core.py:340-344): per-layer synchronization
inhibits async dispatch and slows the measured run.
"""

from __future__ import annotations

import time
from types import SimpleNamespace
from typing import Dict, List, Optional

import jax


class _Recorder:
    def __init__(self, mod, record: SimpleNamespace, measure_runtime: bool):
        self._mod = mod
        self._record = record
        self._measure_runtime = measure_runtime

    def __call__(self, *args, **kwargs):
        if self._measure_runtime:
            from .benchmark import device_sync

            if args:
                device_sync(args[0])
            t0 = time.perf_counter()
            out = self._mod(*args, **kwargs)
            device_sync(out)
            self._record.runtimes.append(time.perf_counter() - t0)
        else:
            out = self._mod(*args, **kwargs)
            self._record.inputs.append(args)
            self._record.outputs.append(out)
        return out

    def __getattr__(self, name):
        return getattr(self._mod, name)


class _MonitorBase:
    measure_runtime = False

    def __init__(self, model, submodules: Optional[List[str]] = None):
        self.model = model
        self.submodules = submodules
        self.records: Dict[str, SimpleNamespace] = {}
        self._originals = {}

    def _targets(self):
        mods = dict(self.model.named_dmx_modules())
        if self.submodules is not None:
            mods = {k: v for k, v in mods.items() if k in self.submodules}
        return mods

    def _set_by_path(self, path: str, value):
        parts = path.split(".")
        obj = self.model.module
        for p in parts[:-1]:
            obj = obj[int(p)] if p.isdigit() else getattr(obj, p)
        last = parts[-1]
        if last.isdigit():
            obj[int(last)] = value
        else:
            setattr(obj, last, value)

    def __enter__(self):
        for name, mod in self._targets().items():
            rec = SimpleNamespace(inputs=[], outputs=[], runtimes=[])
            self.records[name] = rec
            self._originals[name] = mod
            self._set_by_path(name, _Recorder(mod, rec, self.measure_runtime))
        return self

    def __exit__(self, *exc):
        for name, mod in self._originals.items():
            self._set_by_path(name, mod)
        return False


class Monitoring(_MonitorBase):
    """Record per-module inputs/outputs (reference core.py:302-317)."""

    measure_runtime = False


class RuntimeMeasurement(_MonitorBase):
    """Record per-module wall-clock runtimes (reference core.py:320-358)."""

    measure_runtime = True

    def get_records(self) -> Dict[str, List[float]]:
        return {k: v.runtimes for k, v in self.records.items()}
