"""Histogram value domains — the numeric-representation layer under
string histograms.

Reference: `src/lib/statistics/statistics_objects/histogram_domain.{hpp,cpp}`
(StringHistogramDomain: character range + prefix length -> order-preserving
uint64 representation; numeric domains: next/previous value clamped).
Semantics verified against the reference's own unit-test vectors
(`src/test/lib/statistics/statistics_objects/string_histogram_domain_test.cpp`,
e.g. string_to_number('azzz') == 18'279 for domain ['a','z'], prefix 4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


def ipow(base: int, exp: int) -> int:
    """Integer power (`histogram_domain.cpp:112`); Python ints don't
    overflow, matching the reference's use within its asserted bounds."""
    return base**exp


@dataclass(frozen=True)
class StringHistogramDomain:
    """Order-preserving numeric representation for string prefixes.

    `histogram_domain.cpp:7-47`: default domain supports ASCII ' '..'~'
    with prefix length 9 (chosen so the uint64 range is covered).
    """

    min_char: str = " "
    max_char: str = "~"
    prefix_length: int = 9

    def __post_init__(self) -> None:
        if not (len(self.min_char) == 1 and len(self.max_char) == 1):
            raise ValueError("min_char/max_char must be single characters")
        if self.min_char > self.max_char:
            raise ValueError("invalid character range")
        if self.prefix_length <= 0:
            raise ValueError("string prefix too short")
        # prefix must not overflow uint64 (`histogram_domain.cpp:27-29`)
        limit = math.log(2**64 - 1) / math.log(self.character_range_width() + 1)
        if self.prefix_length > limit:
            raise ValueError("string prefix too long")

    def character_range_width(self) -> int:
        return ord(self.max_char) - ord(self.min_char) + 1

    def contains(self, value: str) -> bool:
        return all(self.min_char <= ch <= self.max_char for ch in value)

    def string_to_domain(self, value: str) -> str:
        """Clamp every character into [min_char, max_char]."""
        lo, hi = self.min_char, self.max_char
        return "".join(lo if ch < lo else hi if ch > hi else ch for ch in value)

    def _base_number(self) -> int:
        result = 1
        for exp in range(1, self.prefix_length):
            result += ipow(self.character_range_width(), exp)
        return result

    def string_to_number(self, value: str) -> int:
        """`histogram_domain.cpp:24-47` — order-preserving uint64 repr of
        the first `prefix_length` characters, +1 if the string is longer."""
        if not self.contains(value):
            return self.string_to_number(self.string_to_domain(value))
        base = self._base_number()
        width = self.character_range_width()
        out = 0
        for idx in range(min(len(value), self.prefix_length)):
            out += (ord(value[idx]) - ord(self.min_char)) * base + 1
            base -= ipow(width, self.prefix_length - idx - 1)
        if len(value) > self.prefix_length:
            out += 1
        return out

    def next_value_clamped(self, value: str) -> str:
        """Smallest domain string greater than `value`
        (`histogram_domain.cpp:66-97`); clamped at the domain maximum."""
        if not self.contains(value):
            raise ValueError("unsupported character, cannot compute next value")
        if len(value) < self.prefix_length:
            return value + self.min_char
        if value == self.max_char * self.prefix_length:
            return value
        clipped = value[: self.prefix_length]
        last, head = clipped[-1], clipped[:-1]
        if last != self.max_char:
            return head + chr(ord(last) + 1)
        return StringHistogramDomain(
            self.min_char, self.max_char, self.prefix_length - 1
        ).next_value_clamped(head)


_INT64_MAX = 2**63 - 1
_INT64_MIN = -(2**63)


def next_value_clamped(value, kind: str, domain: StringHistogramDomain | None = None):
    """Domain-dispatching next value (`histogram_domain.hpp:30-48`)."""
    if kind == "int":
        return value if value >= _INT64_MAX else value + 1
    if kind == "float":
        return math.nextafter(value, math.inf)
    if kind == "str":
        return (domain or StringHistogramDomain()).next_value_clamped(value)
    raise ValueError(f"unknown domain kind {kind!r}")


def previous_value_clamped(value, kind: str):
    """Arithmetic-only previous value (`histogram_domain.hpp:36-47`)."""
    if kind == "int":
        return value if value <= _INT64_MIN else value - 1
    if kind == "float":
        return math.nextafter(value, -math.inf)
    raise ValueError(f"previous_value_clamped undefined for {kind!r}")
