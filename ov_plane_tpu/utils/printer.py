"""Leveled console printer (ov_core ``Printer`` analogue; SURVEY §5.5).

The reference routes every diagnostic through ``PRINT_ALL/DEBUG/INFO/
WARNING/ERROR`` macros with a runtime verbosity set from the YAML
``verbosity`` key (run_simulation.cpp:77-79) and ANSI-colors warnings and
errors. This module is the same surface as plain functions; ``load_yaml``
applies the config's ``verbosity`` key on load, and ``print_config``
reproduces the print-on-load audit dump of VioManagerOptions
(VioManagerOptions.h:68-201).
"""

from __future__ import annotations

import dataclasses
import sys

ALL, DEBUG, INFO, WARNING, ERROR, SILENT = range(6)

_LEVEL_NAMES = {"ALL": ALL, "DEBUG": DEBUG, "INFO": INFO,
                "WARNING": WARNING, "ERROR": ERROR, "SILENT": SILENT}

_YELLOW, _RED, _RESET = "\x1b[33m", "\x1b[31m", "\x1b[0m"

_current_level = INFO


def set_print_level(level) -> None:
    """Set the global verbosity from an int or a name ("INFO", "debug", ...)."""
    global _current_level
    if isinstance(level, str):
        try:
            level = _LEVEL_NAMES[level.strip().upper()]
        except KeyError:
            raise ValueError(
                f"unknown verbosity {level!r}; expected one of {sorted(_LEVEL_NAMES)}"
            ) from None
    if not ALL <= int(level) <= SILENT:
        raise ValueError(f"verbosity out of range: {level}")
    _current_level = int(level)


def get_print_level() -> int:
    return _current_level


def _emit(level: int, msg: str, color: str = "") -> None:
    if level >= _current_level:
        out = sys.stderr if level >= WARNING else sys.stdout
        if color and out.isatty():
            msg = f"{color}{msg}{_RESET}"
        print(msg, file=out)


def print_all(msg: str) -> None:
    _emit(ALL, msg)


def print_debug(msg: str) -> None:
    _emit(DEBUG, msg)


def print_info(msg: str) -> None:
    _emit(INFO, msg)


def print_warning(msg: str) -> None:
    _emit(WARNING, msg, _YELLOW)


def print_error(msg: str) -> None:
    _emit(ERROR, msg, _RED)


def print_config(cfg, level: int = DEBUG) -> None:
    """Audit dump of the full (nested) config, one ``section.field: value``
    line each — the print-on-load surface of VioManagerOptions.h:68-201."""
    if level < _current_level:
        return
    def walk(prefix, obj):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if dataclasses.is_dataclass(v):
                walk(f"{prefix}{f.name}.", v)
            else:
                _emit(level, f"  {prefix}{f.name}: {v}")
    _emit(level, f"{type(cfg).__name__}:")
    walk("", cfg)
    unknown = getattr(cfg, "_unknown_keys", None)
    if unknown:
        _emit(level, f"  (unparsed yaml keys: {sorted(unknown)})")
