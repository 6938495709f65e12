"""Back-compat alias (reference tests/test_old_api.py:6-9)."""


def test_mltools_alias():
    import mltools_tpu
    import dmx_compressor_tpu

    assert mltools_tpu is dmx_compressor_tpu
    assert mltools_tpu.nn.Linear is dmx_compressor_tpu.nn.Linear
