"""DNA alphabet encoding shared by every pipeline.

Base codes (uint8), chosen so that A,C,G,T are 0..3 (indexable into 4x4
substitution matrices), with sentinel codes for the symbols vgan's
alignment reconstruction introduces (reference `src/vgan_utils.h:51,57`):

    0..3  A C G T
    4     N          (ambiguous)
    5     '-'        (gap: insertion-in-read on the graph side,
                      deletion-in-read on the read side)
    6     'S'        (softclip marker on the graph side)
    7     rare IUPAC (W M K R Y B D H V — `src/Euka.cpp:472-480`)
"""
from __future__ import annotations

import numpy as np

A, C, G, T, N, GAP, SOFTCLIP, RARE = 0, 1, 2, 3, 4, 5, 6, 7

BASES = "ACGT"

# char -> code lookup (256 entries); default RARE for unknown letters
_LUT = np.full(256, RARE, dtype=np.uint8)
for i, b in enumerate(BASES):
    _LUT[ord(b)] = i
    _LUT[ord(b.lower())] = i
_LUT[ord("N")] = N
_LUT[ord("n")] = N
_LUT[ord("-")] = GAP
_LUT[ord("S")] = SOFTCLIP
for ch in "WMKRYBDHVwmkrybdhv":
    _LUT[ord(ch)] = RARE

_CODE2CHAR = np.frombuffer(b"ACGTN-S?", dtype=np.uint8)

# complement in code space: A<->T, C<->G; N/gap/S/rare map to themselves
_COMP = np.array([T, G, C, A, N, GAP, SOFTCLIP, RARE], dtype=np.uint8)

_COMP_CHAR = np.arange(256, dtype=np.uint8)
for x, y in zip(b"ACGTacgtNn", b"TGCATGCANN"):
    _COMP_CHAR[x] = y

IUPAC_VALID = set("ACGTNWSMKRYBDHVacgtnwsmkrybdhv")


def encode(seq: str | bytes) -> np.ndarray:
    """String -> uint8 code array."""
    if isinstance(seq, str):
        seq = seq.encode()
    return _LUT[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray) -> str:
    """uint8 code array -> string."""
    return _CODE2CHAR[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def complement_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes]


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    return _COMP[codes][::-1]


def revcomp(seq: str) -> str:
    b = seq.encode()
    return _COMP_CHAR[np.frombuffer(b, dtype=np.uint8)][::-1].tobytes().decode()


def is_valid_dna(ch: str) -> bool:
    """IUPAC validity check mirroring libgab's isValidDNA as used by
    `src/process_mapping.cpp:63` (ACGT only count as plain-valid there;
    here we expose the broader IUPAC set for FASTA validation,
    `src/read_fasta.cpp:14-65`)."""
    return ch in IUPAC_VALID
