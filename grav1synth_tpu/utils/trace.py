"""Bitstream field tracing — the FFmpeg trace_headers-style debug log.

Parity with the reference trace subsystem (grav1synth
src/parser/trace.rs:12-197, README.md:44-52): every named syntax
element is logged as ``<abs bit pos> <name> <binary> = <value>`` under
the ``trace_headers`` logger. Enable with GRAV1_LOG=trace_headers=debug
or by calling install_tracer() on a parser. Zero overhead when off:
BitReader only invokes the hook when one is installed.
"""

from __future__ import annotations

import logging
from typing import Optional

trace_log = logging.getLogger("trace_headers")


def field_tracer(base_offset: int = 0):
    """Returns a BitReader trace hook anchored at ``base_offset`` bits
    (e.g. the OBU payload start, so positions match FFmpeg's)."""

    def hook(name: str, pos: int, nbits: int, value: int) -> None:
        binary = format(value & ((1 << nbits) - 1), f"0{nbits}b") if nbits else ""
        trace_log.debug("%d %s %s = %d", pos - base_offset, name, binary, value)

    return hook


def install_tracer(parser) -> None:
    """Attach the field tracer to an Av1Parser (packet-relative bit
    positions)."""
    parser.trace = field_tracer(0)


def tracing_enabled() -> bool:
    return trace_log.isEnabledFor(logging.DEBUG)
