"""Winnowing guarantee property, pinned engine-independently via the
registered DuckDB oracle SQL (the Spark implementation is value-equal
to it by the driver-gate mirror test in test_queries.py):

Schleimer et al. SIGMOD'03, Theorem: any shared token run of length
>= w + k - 1 (window w=4 over k=4-token rolling hashes) yields at least
one shared fingerprint HASH between the two documents.
"""

import duckdb
import pytest

from ocr_gang_spark.textops import _RFP_W, WINNOW_W, _winnow_duck

GUARANTEE = WINNOW_W + _RFP_W - 1  # 7 shared tokens => shared fingerprint


def fp_hashes(texts):
    """Per-doc set of winnow fingerprint hashes via the oracle SQL's
    selection CTE (fp entries are pos * 2^31 + h)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    sql = _winnow_duck().replace(
        "SELECT doc_id,\n           CAST(len(fp) AS BIGINT)",
        "SELECT doc_id, list_transform(fp, k -> k % 2147483648) AS fph,\n"
        "           CAST(len(fp) AS BIGINT)",
    )
    rows = con.sql(sql).fetchall()
    return {r[0]: set(r[1]) for r in rows}


def words(seed, n):
    return " ".join(f"w{seed}x{i}" for i in range(n))


class TestGuarantee:
    @pytest.mark.parametrize("shared_len", [GUARANTEE, GUARANTEE + 3, 15])
    def test_shared_run_shares_a_fingerprint(self, shared_len):
        shared = words("s", shared_len)
        a = f"{words('a', 9)} {shared} {words('b', 9)}"
        b = f"{words('c', 11)} {shared} {words('d', 6)}"
        fps = fp_hashes([a, b])
        assert fps[0] & fps[1], "guarantee violated: no shared fingerprint"

    def test_disjoint_docs_share_nothing(self):
        fps = fp_hashes([words("a", 30), words("b", 30)])
        assert not (fps[0] & fps[1])

    def test_density(self):
        # winnowing keeps roughly 2/(w+1) of windows; for w=4 expect
        # well under half the windows on random-ish text, and >= 1
        fps = fp_hashes([words("a", 100)])
        n_windows = 100 - _RFP_W + 1
        assert 1 <= len(fps[0]) <= n_windows * 0.6

    def test_identical_docs_identical_fingerprints(self):
        t = words("a", 40)
        fps = fp_hashes([t, t])
        assert fps[0] == fps[1] and fps[0]


def test_lang_id_recovers_every_label():
    """lang_id_markers property (engine-independent, via the oracle
    SQL): the injected marker prefix is always recovered — and the
    corpus bodies are verifiably marker-free, so recovery comes from
    the classifier, not luck."""
    from ocr_gang_spark.textops import _LANG_MARKERS, _lang_id_duck

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    ok, n = con.sql(
        f"SELECT COUNT(*) FILTER (predicted_lang = lang), COUNT(*) "
        f"FROM ({_lang_id_duck()})"
    ).fetchone()
    assert ok == n > 0
    for _lang, m in _LANG_MARKERS:
        cnt = con.sql(
            f"SELECT SUM(CAST((length(text) - length(replace(text, '{m}', '')))"
            f" / {len(m)} AS BIGINT)) FROM documents"
        ).fetchone()[0]
        assert cnt == 0, (m, cnt)
