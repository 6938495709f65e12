"""Back-compat alias: ``import mltools_tpu`` is ``dmx_compressor_tpu``.

Mirrors the reference's ``mltools`` alias package
(reference: src/mltools/__init__.py:1-7, which does
``sys.modules["mltools"] = dmx.compressor``).
"""

import sys

import dmx_compressor_tpu

sys.modules["mltools_tpu"] = dmx_compressor_tpu
