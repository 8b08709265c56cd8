from .flash_attention import flash_attention, flash_attention_available


def set_pallas_enabled(enabled: bool) -> None:
    """Honor the ``use_pallas_attention`` config knob (config.py): force the
    XLA attention paths everywhere when False.  Also required under a
    'seq'-sharded mesh: pallas_call is an opaque custom call GSPMD cannot
    partition, so sequence-parallel runs must take the XLA paths (the entry
    points call this automatically)."""
    import importlib

    # NB: `from . import flash_attention` would return the re-exported
    # FUNCTION (rebound by the import above), not the module
    _fa = importlib.import_module(f"{__name__}.flash_attention")
    _swat = importlib.import_module(f"{__name__}.swat_attention")
    _fa._DISABLE = not enabled
    _swat._DISABLE = not enabled


__all__ = ["flash_attention", "flash_attention_available", "set_pallas_enabled"]
