"""Replay properties batch 8: the multimodal (opaque-binary media)
family — metadata, fixed-size chunk fingerprints, chunk-level dedup,
frame sampling, the stubbed decode contract, and the real-bytes RAW1
decode — all recomputed with hashlib/pure Python over the utf-8
payload bytes.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from replay_profile import replay_settings

from test_replay_properties import _entry
from test_replay_properties4 import _write_docs_src

_SETTINGS = replay_settings(10)

# payloads with shared 64-byte blocks so chunk-level dedup fires:
# text = block-aligned repeats of a few base blocks
_blocks = st.lists(st.sampled_from(["a" * 64, "b" * 64, "ab" * 32]), max_size=5)
_docs_media = st.lists(
    st.tuples(
        st.just("src0"),
        st.one_of(
            st.text("abc", max_size=10),          # short/odd-length payloads
            _blocks.map("".join),                  # block-aligned payloads
        ),
    ),
    min_size=1,
    max_size=10,
)


def _chunks(text):
    """(chunk_idx, fp) per 64-byte chunk: fp = md5 of the UPPERCASE hex
    encoding (the engine-portable hex round-trip)."""
    buf = text.encode()
    out = []
    for idx in range(math.ceil(len(buf) / 64)):
        chunk = buf[idx * 64 : idx * 64 + 64]
        out.append((idx, hashlib.md5(chunk.hex().upper().encode()).hexdigest()))
    return out


@given(docs=_docs_media)
@_SETTINGS
def test_multimodal_meta_chunks_frames_match_hashlib(spark, docs):
    """Metadata, chunk fingerprints, and every-4th-frame sampling vs
    Python byte math + hashlib over the same payloads."""
    tmp = _write_docs_src(spark, docs)
    got_m = {
        r.doc_id: (r.n_bytes, r.n_chunks)
        for r in _entry("multimodal_meta")(spark, tmp).collect()
    }
    got_c = {
        (r.doc_id, r.chunk_idx): r.chunk_fp
        for r in _entry("multimodal_chunks")(spark, tmp).collect()
    }
    got_f = {
        (r.doc_id, r.chunk_idx): r.chunk_fp
        for r in _entry("multimodal_frame_sample")(spark, tmp).collect()
    }
    want_m, want_c = {}, {}
    for i, (_s, t) in enumerate(docs):
        n = len(t.encode())
        want_m[i] = (n, n // 1000 + 1)
        for idx, fp in _chunks(t):
            want_c[(i, idx)] = fp
    assert got_m == want_m, (docs, got_m, want_m)
    assert got_c == want_c, (docs, got_c, want_c)
    assert got_f == {k: v for k, v in want_c.items() if k[1] % 4 == 0}


@given(docs=_docs_media)
@_SETTINGS
def test_multimodal_dedup_matches_hashlib(spark, docs):
    """Cross-document chunk dedup vs Python fingerprint grouping."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.chunk_fp: (r.n_copies, r.n_docs, r.canonical_doc)
        for r in _entry("multimodal_dedup")(spark, tmp).collect()
    }
    occ: dict = {}
    for i, (_s, t) in enumerate(docs):
        for _idx, fp in _chunks(t):
            occ.setdefault(fp, []).append(i)
    want = {
        fp: (len(ds), len(set(ds)), min(ds))
        for fp, ds in occ.items()
        if len(ds) > 1
    }
    assert got == want, (docs, got, want)


@given(docs=_docs_media)
@_SETTINGS
def test_multimodal_decode_matches_stub_contract(spark, docs):
    """The Arrow-batched decode stage vs the documented deterministic
    stub: width = 100 + n_bytes % 540, height = 100 + first_byte % 380."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.doc_id: (r.media_type, r.n_bytes, r.width, r.height)
        for r in _entry("multimodal_decode")(spark, tmp).collect()
    }
    want = {}
    for i, (_s, t) in enumerate(docs):
        buf = t.encode()
        want[i] = (
            "application/octet-stream",
            len(buf),
            100 + len(buf) % 540,
            100 + (buf[0] if buf else 0) % 380,
        )
    assert got == want, (docs, got, want)


@given(docs=_docs_media)
@_SETTINGS
def test_multimodal_decode_raw_matches_hashlib(spark, docs):
    """RAW1 end-to-end decode vs Python: md5-derived pixel planes,
    header dims from doc_id, ascii pixel sums."""
    tmp = _write_docs_src(spark, docs)
    got = {
        r.doc_id: (r.valid, r.width, r.height, r.channels, r.n_pixels, r.pixel_sum)
        for r in _entry("multimodal_decode_raw")(spark, tmp).collect()
    }
    want = {}
    for i in range(len(docs)):
        w, h = 4 + i % 8, 3 + i % 5
        pix = (hashlib.md5(str(i).encode()).hexdigest() * 3)[: w * h]
        want[i] = (True, w, h, 1, w * h, sum(ord(c) for c in pix))
    assert got == want, (docs, got, want)
