#!/usr/bin/env python
"""Generate the committed expected-output parquet fixtures that give the
image-kernel driver queries real rows+schema+hash CORRECTNESS checks.

The flagship extraction's expected output is a pure function of the
testdata documents table (VERDICT r1 item 1):

* text spans  — strip_html of the fixed spans_from_testdata template
  (our pinned spec, applied here in plain Python, no Spark);
* media spans — the page renderer's expected text BY CONSTRUCTION
  (atlas.page_for_ref renders random_text(media_ref) and returns the
  exact string the reference OCR semantics yield on that page —
  independent of the trained weights);
* segmentation boxes / first-glyph matrix dump — the NumPy oracle
  kernels over the deterministically rendered pages (pinned vs the C
  semantics by hand-enumerable micro-tests in tests/test_image_ops.py).

Each row is tagged with ``corpus_key`` = the sum of per-document 32-bit
md5 text prefixes (the testdata tiers share row COUNTS — sf0.001 and
sf0.01 both have 500 docs — so a count tag would collide; the content
key cannot).  ONE committed parquet then serves every tier: the oracle
SQL filters ``corpus_key = (SELECT CAST(SUM(md5-prefix) AS VARCHAR)
FROM documents)`` and returns exactly the slice matching the corpus the
driver is running.

Writes fixtures/expected_extraction.parquet,
fixtures/expected_segmentation.parquet, fixtures/expected_matrix_dump.parquet.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ocr_gang_spark.atlas import page_for_ref  # noqa: E402
from ocr_gang_spark.kernels.html_strip import strip_html  # noqa: E402
from ocr_gang_spark.kernels.image_ops import (  # noqa: E402
    binarize,
    char_items,
    col_marker_mask,
    row_marker_mask,
    runs_of_nonmarker,
    segment_page,
)

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
FIXDIR = os.path.join(ROOT, "fixtures")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# must mirror ocr_gang_spark.synth.spans_from_testdata exactly
TPL = (
    "<head><title>t</title></head><div>%s</div>"
    "<script>var x=1;</script><p>tail &amp; done</p>"
)
SEED = 42
MEDIA_PER_DOC = 2


def corpus_key_of(sf_dir: str) -> str:
    """Order-insensitive corpus content key: decimal string of the sum of
    per-document 32-bit md5 text prefixes.  Must stay in lockstep with
    _CORPUS_KEY_SQL in ocr_gang_spark/extraction_queries.py."""
    import hashlib

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    total = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for t in docs.column("text").to_pylist()
    )
    return str(total)


def expected_rows_for(sf_dir: str):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_rows = corpus_key_of(sf_dir)
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()

    ext, seg, dump = [], [], []
    for did, text in zip(ids, texts):
        doc_id = f"doc-{did:08d}"
        n_media = did % MEDIA_PER_DOC + 1
        ext.append((n_rows, doc_id, 0, "text", strip_html(TPL % text), None, 0))
        for i in range(1, n_media + 1):
            ref = f"m{SEED}-{doc_id}-{i}"
            expected_text, page = page_for_ref(ref)
            ext.append((n_rows, doc_id, i, "media", expected_text, ref, i))

            bw = binarize(page)
            for li, (y0, y1) in enumerate(runs_of_nonmarker(row_marker_mask(bw))):
                items = char_items(col_marker_mask(bw[y0:y1, :]))
                seg.append(
                    (n_rows, ref, li, int(y0), int(y1),
                     sum(1 for it in items if it[0] == "glyph"),
                     sum(1 for it in items if it[0] == "space"))
                )

            # G9 SaveMatrix analog: the FIRST glyph matrix of the page as
            # 28 lines of '0'/'1' (reference segmentation.c:373-386 dumps
            # matrix[0]); pages whose first item is a space dump nothing
            first = None
            for line in segment_page(bw):
                for mat in line:
                    first = mat
                    break
                break
            txt = (
                "\n".join("".join(str(int(v)) for v in row) for row in np.asarray(first))
                if first is not None
                else None
            )
            dump.append((n_rows, ref, txt))
    return ext, seg, dump


def expected_preproc_rows_for(sf_dir: str):
    """Offline NumPy run of the preprocessing kernels (Otsu / Hough
    deskew / connected components) over the SAME decoded blobs the
    Spark queries see — preproc_queries.preproc_rows_for_blob is shared
    verbatim, so the fixture is exact by construction including the
    lossy-JPEG decode branch."""
    from ocr_gang_spark.preproc_queries import preproc_rows_for_blob
    from ocr_gang_spark.synth import blob_for_ref

    key = corpus_key_of(sf_dir)
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    rows = []
    for did in docs.column("doc_id").to_pylist():
        for i in range(1, did % MEDIA_PER_DOC + 2):
            ref = f"m{SEED}-doc-{did:08d}-{i}"
            rows.append((key,) + preproc_rows_for_blob(ref, blob_for_ref(ref)))
    return rows


def expected_augmentation_rows():
    """Offline NumPy run of the T2 kernels over the 52-class atlas —
    the value oracle for the distributed augmentation_counts query
    (sf-independent, so no corpus_key)."""
    from ocr_gang_spark.atlas import class_matrices
    from ocr_gang_spark.kernels.augment import augment_copy
    from ocr_gang_spark.training_queries import N_CLASSES, N_COPIES

    mats = class_matrices()
    rows = []
    for cls in range(N_CLASSES):
        for copy_id in range(1, N_COPIES + 1):
            out, op = augment_copy(mats[cls], f"{cls}:{copy_id}")
            rows.append((cls, copy_id, op, int(out.sum())))
    return rows


def expected_media_rows():
    """Per-ref blob metadata + audio/video features, offline (pure
    functions of the refs; the media_ref set is the union over tiers —
    identical doc_id sets, so it dedupes to one)."""
    from ocr_gang_spark.kernels.media_meta import (
        audio_features,
        decode_wav,
        sample_frames,
        sniff_media_meta,
        synth_audio_blob,
        synth_video_blob,
        video_frame_index,
    )
    from ocr_gang_spark.media_queries import N_AUDIO, N_VIDEO
    from ocr_gang_spark.synth import blob_for_ref

    refs = set()
    for sf_dir in SF_DIRS:
        docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        for did in docs.column("doc_id").to_pylist():
            for i in range(1, did % MEDIA_PER_DOC + 2):
                refs.add(f"m{SEED}-doc-{did:08d}-{i}")
    meta = []
    for ref in sorted(refs):
        blob = blob_for_ref(ref)
        fmt, w, h = sniff_media_meta(blob)
        meta.append((ref, fmt, w, h, len(blob)))

    audio = []
    for i in range(N_AUDIO):
        ref = f"aud-{i:03d}"
        blob = synth_audio_blob(ref)
        fmt, _, _ = sniff_media_meta(blob)
        rate, samples = decode_wav(blob)
        n, dur, rms, zcr = audio_features(samples, rate)
        audio.append((ref, fmt, n, dur, rms, zcr))

    video = []
    for i in range(N_VIDEO):
        ref = f"vid-{i:03d}"
        blob = synth_video_blob(ref)
        _, w, h = sniff_media_meta(blob)
        n_frames = len(video_frame_index(blob))
        n_sampled = n_ink = 0
        for _idx, frame in sample_frames(blob, stride=2):
            n_sampled += 1
            n_ink += int(np.sum(frame[:, :, 0] == 0))
        video.append((ref, n_frames, w, h, n_sampled, n_ink))
    return meta, audio, video


def expected_pdf_rows():
    """Offline run of the PDF layout kernel over the fixed 96-ref sample
    set (pure functions of the refs; sf-independent)."""
    from ocr_gang_spark.kernels.pdf import extract_pdf_layout, synth_pdf_blob
    from ocr_gang_spark.media_queries import N_PDF

    rows = []
    for i in range(N_PDF):
        ref = f"pdf-{i:03d}"
        for page, line_no, x, y, text in extract_pdf_layout(synth_pdf_blob(ref)):
            rows.append((ref, page, line_no, x, y, text))
    return rows


def main() -> None:
    all_ext, all_seg, all_dump = [], [], []
    for sf_dir in SF_DIRS:
        e, s, d = expected_rows_for(sf_dir)
        print(f"{sf_dir}: {len(e)} extraction rows, {len(s)} box rows, {len(d)} dumps")
        all_ext += e
        all_seg += s
        all_dump += d

    pre_rows = []
    for sf_dir in SF_DIRS:
        pre_rows += expected_preproc_rows_for(sf_dir)
    pre_schema = pa.schema(
        [
            ("corpus_key", pa.string()),
            ("media_ref", pa.string()),
            ("otsu_t", pa.int32()),
            ("ink_otsu", pa.int64()),
            ("ink_fixed", pa.int64()),
            ("applied_deg", pa.float64()),
            ("detected_deg", pa.float64()),
            ("n_cc", pa.int32()),
            ("max_area", pa.int64()),
        ]
    )
    cols = list(zip(*pre_rows))
    pq.write_table(
        pa.table(
            {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(pre_schema)},
            schema=pre_schema,
        ),
        os.path.join(FIXDIR, "expected_preproc.parquet"),
        compression="zstd",
    )
    print(f"wrote expected_preproc.parquet ({len(pre_rows)} rows)")

    aug_rows = expected_augmentation_rows()
    aug_schema = pa.schema(
        [
            ("cls", pa.int32()),
            ("copy_id", pa.int32()),
            ("op", pa.string()),
            ("n_ink", pa.int64()),
        ]
    )
    cols = list(zip(*aug_rows))
    pq.write_table(
        pa.table(
            {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(aug_schema)},
            schema=aug_schema,
        ),
        os.path.join(FIXDIR, "expected_augmentation.parquet"),
        compression="zstd",
    )
    print(f"wrote expected_augmentation.parquet ({len(aug_rows)} rows)")

    meta, audio, video = expected_media_rows()
    for name, rows, schema in [
        (
            "expected_media_meta",
            meta,
            pa.schema(
                [("media_ref", pa.string()), ("fmt", pa.string()),
                 ("width", pa.int32()), ("height", pa.int32()),
                 ("n_bytes", pa.int64())]
            ),
        ),
        (
            "expected_audio",
            audio,
            pa.schema(
                [("audio_ref", pa.string()), ("fmt", pa.string()),
                 ("n_samples", pa.int64()), ("duration_s", pa.float64()),
                 ("rms", pa.float64()), ("zcr", pa.float64())]
            ),
        ),
        (
            "expected_video",
            video,
            pa.schema(
                [("video_ref", pa.string()), ("n_frames", pa.int32()),
                 ("width", pa.int32()), ("height", pa.int32()),
                 ("n_sampled", pa.int32()), ("n_ink_sampled", pa.int64())]
            ),
        ),
    ]:
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(
                {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(schema)},
                schema=schema,
            ),
            os.path.join(FIXDIR, f"{name}.parquet"),
            compression="zstd",
        )
        print(f"wrote {name}.parquet ({len(rows)} rows)")

    pdf_rows = expected_pdf_rows()
    pdf_schema = pa.schema(
        [
            ("pdf_ref", pa.string()),
            ("page", pa.int32()),
            ("line_no", pa.int32()),
            ("x", pa.float64()),
            ("y", pa.float64()),
            ("text", pa.string()),
        ]
    )
    cols = list(zip(*pdf_rows))
    pq.write_table(
        pa.table(
            {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(pdf_schema)},
            schema=pdf_schema,
        ),
        os.path.join(FIXDIR, "expected_pdf.parquet"),
        compression="zstd",
    )
    print(f"wrote expected_pdf.parquet ({len(pdf_rows)} rows)")

    ext_schema = pa.schema(
        [
            ("corpus_key", pa.string()),
            ("doc_id", pa.string()),
            ("pos", pa.int32()),
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    seg_schema = pa.schema(
        [
            ("corpus_key", pa.string()),
            ("media_ref", pa.string()),
            ("line_idx", pa.int32()),
            ("y0", pa.int32()),
            ("y1", pa.int32()),
            ("n_glyphs", pa.int32()),
            ("n_spaces", pa.int32()),
        ]
    )
    dump_schema = pa.schema(
        [
            ("corpus_key", pa.string()),
            ("media_ref", pa.string()),
            ("matrix_txt", pa.string()),
        ]
    )
    for name, rows, schema in [
        ("expected_extraction", all_ext, ext_schema),
        ("expected_segmentation", all_seg, seg_schema),
        ("expected_matrix_dump", all_dump, dump_schema),
    ]:
        cols = list(zip(*rows))
        table = pa.table(
            {f.name: pa.array(cols[i], type=f.type) for i, f in enumerate(schema)},
            schema=schema,
        )
        path = os.path.join(FIXDIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"wrote {path} ({os.path.getsize(path)} bytes, {table.num_rows} rows)")


if __name__ == "__main__":
    main()
