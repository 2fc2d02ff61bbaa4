"""Leveled printer (ov_core Printer analogue) + verbosity config wiring."""

import io
import sys

from ov_plane_tpu.utils import printer
from ov_plane_tpu.utils.config import sim_config


def _capture(fn, *a):
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = sys.stderr = buf = io.StringIO()
    try:
        fn(*a)
    finally:
        sys.stdout, sys.stderr = old_out, old_err
    return buf.getvalue()


def test_levels_filter():
    printer.set_print_level("WARNING")
    try:
        assert _capture(printer.print_info, "quiet") == ""
        assert "loud" in _capture(printer.print_warning, "loud")
        assert "bad" in _capture(printer.print_error, "bad")
        printer.set_print_level("SILENT")
        assert _capture(printer.print_error, "mute") == ""
    finally:
        printer.set_print_level("INFO")


def test_level_names_and_validation():
    import pytest

    printer.set_print_level("debug")
    assert printer.get_print_level() == printer.DEBUG
    printer.set_print_level(printer.INFO)
    with pytest.raises(ValueError):
        printer.set_print_level("LOUD")
    with pytest.raises(ValueError):
        printer.set_print_level(17)


def test_yaml_verbosity_parsed_and_audit_dump():
    cfg = sim_config()  # loads reference yaml with verbosity: INFO
    assert cfg.verbosity == "INFO"
    # The loader is side-effect-free: entry points apply cfg.verbosity.
    before = printer.get_print_level()
    assert printer.get_print_level() == before
    out = _capture(printer.print_config, cfg, printer.INFO)
    assert "state.max_clone_size" in out
    assert "imu_noises.sigma_w" in out
