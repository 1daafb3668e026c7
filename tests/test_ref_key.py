"""Keeper-key packing (media_queries._pack_ref_key): MIN over the
packed BIGINT must equal lexicographic MIN over (doc_id, span_idx).
r4's *10 radix silently elected the wrong keeper for docs with >=10
media spans (VERDICT r4 wrong #2); radix 100 + a loud guard fixes it.
No Spark needed — the packing is pure and the dedup queries take MIN
over exactly these values."""

import pytest

from ocr_gang_spark.media_queries import _REF_KEY_RADIX, _pack_ref_key, _ref_key


def test_twelve_span_doc_keeper_ordering():
    # the case the *10 radix corrupted: doc 7 with spans 0..11 vs doc 8
    # span 0.  Under *10, (7, 11) packed to 81 < 80 = (8, 0) — electing
    # doc 7 span 11 over doc 8 span 0 is fine, but (7, 11)=81 > (7, 2)=72
    # collided ACROSS docs: (7,11)->81 == (8,1)->81.  Radix 100 keeps
    # packed order == lexicographic order for every span index < 100.
    keys = [(7, i) for i in range(12)] + [(8, 0), (8, 1)]
    packed = [_pack_ref_key(d, i) for d, i in keys]
    assert sorted(range(len(keys)), key=lambda j: packed[j]) == sorted(
        range(len(keys)), key=lambda j: keys[j]
    )
    # no cross-doc collisions (the *10 failure mode: 7*10+11 == 8*10+1)
    assert len(set(packed)) == len(packed)


def test_pack_round_trips_through_div_mod():
    # the queries reconstruct keep_ref via DIV/% — must invert the pack
    for d in (0, 7, 99999999):
        for i in (0, 1, 9, 10, 11, _REF_KEY_RADIX - 1):
            k = _pack_ref_key(d, i)
            assert (k // _REF_KEY_RADIX, k % _REF_KEY_RADIX) == (d, i)


def test_pack_overflow_is_loud():
    with pytest.raises(ValueError, match="keeper-key radix"):
        _pack_ref_key(3, _REF_KEY_RADIX)


def test_ref_parse_feeds_pack():
    d, i = _ref_key("m42-doc-00000042-11")
    assert _pack_ref_key(d, i) == 42 * _REF_KEY_RADIX + 11
