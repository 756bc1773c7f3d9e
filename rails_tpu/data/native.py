"""ctypes bindings for the native (C++) sequence loader.

The shared library (`native/libsequence_loader.so`, built by `make -C native`)
replaces the host-side hot loops: CSV sequence parsing and fixed-shape batch
assembly. Everything degrades gracefully to the NumPy implementations in
`rails_tpu/data/datasets.py` when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libsequence_loader.so",
)
_lib = None
_load_failed = False


class _ParsedSequences(ctypes.Structure):
    _fields_ = [
        ("num_users", ctypes.c_int64),
        ("total_events", ctypes.c_int64),
        ("user_ids", ctypes.POINTER(ctypes.c_int32)),
        ("offsets", ctypes.POINTER(ctypes.c_int64)),
        ("item_ids", ctypes.POINTER(ctypes.c_int32)),
        ("ratings", ctypes.POINTER(ctypes.c_int32)),
        ("timestamps", ctypes.POINTER(ctypes.c_int64)),
        ("error", ctypes.c_char_p),
        ("skipped_rows", ctypes.c_int64),
    ]


def _build_library() -> bool:
    native_dir = os.path.dirname(_LIB_PATH)
    try:
        subprocess.run(
            ["make", "-C", native_dir], check=True, capture_output=True
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use if a toolchain is available). A failed
    build/load is cached so callers don't re-invoke make per batch."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        if not (build_if_missing and _build_library()):
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.parse_sasrec_csv.restype = ctypes.POINTER(_ParsedSequences)
        lib.parse_sasrec_csv.argtypes = [ctypes.c_char_p]
        lib.free_parsed_sequences.argtypes = [ctypes.POINTER(_ParsedSequences)]
        lib.assemble_batch.restype = None
    except OSError:
        # Unloadable .so (interrupted build, foreign-arch copy, stale ABI):
        # try ONE rebuild, else cache the failure and degrade to numpy.
        import logging

        if build_if_missing and _build_library():
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.parse_sasrec_csv.restype = ctypes.POINTER(_ParsedSequences)
                lib.parse_sasrec_csv.argtypes = [ctypes.c_char_p]
                lib.free_parsed_sequences.argtypes = [
                    ctypes.POINTER(_ParsedSequences)
                ]
                lib.assemble_batch.restype = None
                _lib = lib
                return lib
            except OSError:
                pass
        logging.getLogger("rails_tpu").warning(
            "native loader %s failed to load; using the numpy fallback",
            _LIB_PATH,
        )
        _load_failed = True
        return None
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def parse_sasrec_csv_native(path: str):
    """Parse via the native loader; returns a RaggedSequences or None."""
    from rails_tpu.data.datasets import RaggedSequences

    lib = load_library()
    if lib is None:
        return None
    res = lib.parse_sasrec_csv(path.encode())
    try:
        r = res.contents
        if r.error:
            # Return None (not raise) so the caller's pure-Python parser
            # engages as the documented graceful fallback.
            import logging

            logging.getLogger("rails_tpu").warning(
                "native csv parse failed, falling back to python parser: "
                "%s (%s)", r.error.decode(), path,
            )
            return None
        nu, te = r.num_users, r.total_events
        if r.skipped_rows:
            import logging

            if nu == 0:
                # Every row unparseable: let the (more tolerant) python
                # parser try rather than returning an empty dataset.
                logging.getLogger("rails_tpu").warning(
                    "native csv parse skipped ALL %d rows of %s; falling "
                    "back to the python parser", r.skipped_rows, path,
                )
                return None
            logging.getLogger("rails_tpu").warning(
                "native csv parse skipped %d malformed row(s) of %s",
                r.skipped_rows, path,
            )
        out = RaggedSequences(
            user_ids=np.ctypeslib.as_array(r.user_ids, (nu,)).copy(),
            offsets=np.ctypeslib.as_array(r.offsets, (nu + 1,)).copy(),
            item_ids=np.ctypeslib.as_array(r.item_ids, (te,)).copy(),
            ratings=np.ctypeslib.as_array(r.ratings, (te,)).copy(),
            timestamps=np.ctypeslib.as_array(r.timestamps, (te,)).copy(),
        )
        return out
    finally:
        lib.free_parsed_sequences(res)


def assemble_batch_native(
    seqs,                      # RaggedSequences
    user_indices: np.ndarray,  # (B,) indices into seqs
    max_seq_len: int,
    ignore_last_n: int,
):
    """Native fixed-shape batch assembly; returns the same tuple as
    SequenceDataset.rows, or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    b = len(user_indices)
    n = max_seq_len
    lengths = np.zeros((b,), np.int32)
    hist_ids = np.zeros((b, n), np.int32)
    hist_ratings = np.zeros((b, n), np.int32)
    hist_ts = np.zeros((b, n), np.int64)
    tgt_ids = np.zeros((b,), np.int32)
    tgt_ratings = np.zeros((b,), np.int32)
    tgt_ts = np.zeros((b,), np.int64)
    user_ids = np.zeros((b,), np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    ui = np.ascontiguousarray(user_indices, dtype=np.int64)
    lib.assemble_batch(
        ptr(seqs.user_ids, ctypes.c_int32),
        ptr(seqs.offsets, ctypes.c_int64),
        ptr(seqs.item_ids, ctypes.c_int32),
        ptr(seqs.ratings, ctypes.c_int32),
        ptr(seqs.timestamps, ctypes.c_int64),
        ptr(ui, ctypes.c_int64),
        ctypes.c_int64(b),
        ctypes.c_int64(n),
        ctypes.c_int64(ignore_last_n),
        ptr(lengths, ctypes.c_int32),
        ptr(hist_ids, ctypes.c_int32),
        ptr(hist_ratings, ctypes.c_int32),
        ptr(hist_ts, ctypes.c_int64),
        ptr(tgt_ids, ctypes.c_int32),
        ptr(tgt_ratings, ctypes.c_int32),
        ptr(tgt_ts, ctypes.c_int64),
        ptr(user_ids, ctypes.c_int32),
    )
    return (
        lengths, hist_ids, hist_ratings, hist_ts,
        tgt_ids, tgt_ratings, tgt_ts, user_ids,
    )
