"""Edge-case tests for the round-2 web-pipeline operators (PII
redaction, URL parsing, sliding-window chunking, blocking-graph
triangles, incremental dedup) — cases the sf-corpus oracle sweep
cannot hit (clean text, short docs, window boundaries, empty edge
sets)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vietnamese_ocr_ray.functions.chunk import CHUNK, STRIDE, doc_chunks_batch
from vietnamese_ocr_ray.functions.dedup import (
    candidate_dup_edges,
    dup_triangles,
    incremental_dedup,
)
from vietnamese_ocr_ray.functions.pii import pii_redact_batch
from vietnamese_ocr_ray.functions.text import gopher_rules_batch
from vietnamese_ocr_ray.functions.url import synth_url_array, url_parse


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_redact_counts_and_placeholders():
    t = pa.table(
        {
            "doc_id": pa.array([7], pa.int64()),
            "source": pa.array(["web"]),
            "text": pa.array(["plain words only"]),
        }
    )
    out = pii_redact_batch(t)
    # synth plants exactly one email, one 555- phone, one dotted quad
    assert out.column("n_emails").to_pylist() == [1]
    assert out.column("n_phones").to_pylist() == [1]
    assert out.column("n_ips").to_pylist() == [1]
    clean = out.column("clean_text").to_pylist()[0]
    assert "<EMAIL>" in clean and "<IP>" in clean and "<PHONE>" in clean
    assert "@" not in clean
    assert clean.startswith("plain words only")


def test_pii_redaction_order_email_before_ip():
    # an email whose domain is digit-heavy must be eaten by the EMAIL
    # pass, not half-matched as an IP later
    from vietnamese_ocr_ray.functions.pii import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
    )
    import pyarrow.compute as pc

    text = pa.array(["reach x9@10.22.33.44mail.com now"])
    clean = pc.replace_substring_regex(text, pattern=EMAIL_RE, replacement="<EMAIL>")
    clean = pc.replace_substring_regex(clean, pattern=IP_RE, replacement="<IP>")
    clean = pc.replace_substring_regex(clean, pattern=PHONE_RE, replacement="<PHONE>")
    assert clean.to_pylist() == ["reach <EMAIL> now"]


# ---------------------------------------------------------------------------
# URL
# ---------------------------------------------------------------------------


def test_url_registered_domain_public_suffix(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([4, 5], pa.int64()),  # 4 -> .co.uk, 5 -> .com
            "lang": pa.array(["vi", "en"]),
            "source": pa.array(["web", "cc"]),
        }
    )
    urls = synth_url_array(t).to_pylist()
    assert urls[0].endswith("?ref=4") is False  # 4 % 3 != 0 -> no query
    out = url_parse(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["host"].tolist() == ["www.web-4.co.uk", "www.cc-5.com"]
    # .co.uk keeps THREE labels, .com keeps two
    assert out["registered_domain"].tolist() == ["web-4.co.uk", "cc-5.com"]
    assert out["path"].tolist() == ["/vi/article/4", "/en/article/5"]


def test_domain_cap_keeps_at_most_k_per_domain(ray_session):
    from vietnamese_ocr_ray.functions.url import domain_cap

    # 120 docs over 13 hosts x 2 suffixes per source -> some domains
    # exceed the cap of 3
    n = 120
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "lang": pa.array(["vi"] * n),
            "source": pa.array(["web"] * n),
        }
    )
    out = domain_cap(rd.from_arrow(t), k=3).to_pandas()
    sizes = out.groupby("registered_domain").size()
    assert (sizes <= 3).all()
    # survivors are a subset of the corpus, no duplicates
    assert out["doc_id"].is_unique
    assert set(out["doc_id"]) <= set(range(n))
    # deterministic under repartitioning
    out2 = domain_cap(rd.from_arrow(t).repartition(7), k=3).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_chunk_windows_cover_and_overlap():
    n = CHUNK + STRIDE + 5  # 3 windows
    toks = [f"t{i}" for i in range(n)]
    t = _docs([(1, " ".join(toks))])
    out = doc_chunks_batch(t)
    assert out.num_rows == 1 + int(np.ceil((n - CHUNK) / STRIDE))
    texts = out.column("chunk_text").to_pylist()
    # window j starts at token j*STRIDE and has CHUNK tokens (clipped)
    for j, chunk in enumerate(texts):
        got = chunk.split(" ")
        want = toks[j * STRIDE : j * STRIDE + CHUNK]
        assert got == want
    # overlap: last CHUNK-STRIDE tokens of window 0 == first of window 1
    assert texts[0].split(" ")[STRIDE:] == texts[1].split(" ")[: CHUNK - STRIDE]


def test_chunk_short_doc_single_window():
    t = _docs([(1, "a b c"), (2, " ".join(["x"] * CHUNK))])
    out = doc_chunks_batch(t)
    assert out.num_rows == 2
    assert out.column("n_tokens").to_pylist() == [3, CHUNK]
    assert out.column("chunk_text").to_pylist()[0] == "a b c"


def test_chunk_exact_boundary():
    # n = CHUNK + STRIDE exactly -> second window is a full CHUNK? no:
    # it covers tokens [STRIDE, STRIDE+CHUNK) clipped to n = full CHUNK
    n = CHUNK + STRIDE
    t = _docs([(9, " ".join(f"w{i}" for i in range(n)))])
    out = doc_chunks_batch(t)
    assert out.num_rows == 2
    assert out.column("n_tokens").to_pylist() == [CHUNK, n - STRIDE]


def test_chunk_non_ascii_byte_safety():
    t = _docs([(3, "mở cửa sổ lớn " * 10 + "cuối")])
    out = doc_chunks_batch(t)
    joined = out.column("chunk_text").to_pylist()
    for c in joined:
        c.encode("utf-8")  # valid utf8 (no mid-codepoint slicing)
    assert joined[0].split(" ")[:3] == ["mở", "cửa", "sổ"]


# ---------------------------------------------------------------------------
# triangles / incremental dedup
# ---------------------------------------------------------------------------


def test_dup_triangles_planted_clique(ray_session):
    # 4-clique on (lang, n_chars) -> C(4,3)=4; plus a pair (no triangle)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "lang": pa.array(["vi"] * 4 + ["en"] * 2),
            "n_chars": pa.array([10, 10, 10, 10, 7, 7], pa.int64()),
        }
    )
    out = dup_triangles(rd.from_arrow(t))
    assert out.column("n_triangles").to_pylist() == [4]


def test_dup_triangles_empty_graph(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["vi", "en"]),
            "n_chars": pa.array([5, 9], pa.int64()),
        }
    )
    out = dup_triangles(rd.from_arrow(t))
    assert out.column("n_triangles").to_pylist() == [0]


def test_candidate_edges_are_ordered_pairs(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([30, 10, 20], pa.int64()),
            "lang": pa.array(["vi"] * 3),
            "n_chars": pa.array([8, 8, 8], pa.int64()),
        }
    )
    df = candidate_dup_edges(rd.from_arrow(t)).to_pandas()
    got = sorted(map(tuple, df[["u", "v"]].to_numpy()))
    assert got == [(10, 20), (10, 30), (20, 30)]


def test_incremental_dedup_drops_only_seen_content(ray_session):
    new = _docs([(10, "dup text"), (20, "fresh text")])
    old = _docs([(1, "dup text"), (2, "other")])
    out = incremental_dedup(rd.from_arrow(new), rd.from_arrow(old))
    assert out.to_pandas()["doc_id"].tolist() == [20]


# ---------------------------------------------------------------------------
# gopher rules
# ---------------------------------------------------------------------------


def test_gopher_rules_each_rule_fires():
    long_ok = "the " + " ".join(["words"] * 40)  # mean word len 4.95, has 'the'
    short = "the tiny doc"
    fillery = "the " + " ".join(["a"] * 40)
    nostop = " ".join(["word"] * 40)
    t = _docs([(1, long_ok), (2, short), (3, fillery), (4, nostop)])
    out = gopher_rules_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "kept"] == 1
    assert out.loc[2, "r_len"] == 0 and out.loc[2, "kept"] == 0
    assert out.loc[3, "r_filler"] == 0 and out.loc[3, "kept"] == 0
    assert out.loc[4, "r_stop"] == 0 and out.loc[4, "kept"] == 0


def test_gopher_and_chunk_handle_empty_text():
    t = _docs([(1, ""), (2, "the " + " ".join(["words"] * 40))])
    g = gopher_rules_batch(t).to_pandas().set_index("doc_id")
    assert g.loc[1, "kept"] == 0 and g.loc[1, "r_len"] == 0
    c = doc_chunks_batch(t)
    # "" splits to one empty token -> one empty window; doc 2 has 41
    # tokens -> 2 overlapping windows
    assert c.num_rows == 3
    assert c.column("chunk_text").to_pylist()[0] == ""
    assert c.column("n_tokens").to_pylist() == [1, 32, 41 - 24]


def test_snapshot_common_keeps_only_seen_content(ray_session):
    from vietnamese_ocr_ray.functions.dedup import snapshot_common

    old = _docs([(0, "alpha beta"), (1, "gamma delta")])
    new = _docs([(10, "alpha beta"), (11, "fresh text"), (12, "gamma delta")])
    out = snapshot_common(
        rd.from_arrow(new), rd.from_arrow(old)
    ).to_pandas()
    assert sorted(out["doc_id"]) == [10, 12]
    # empty intersect keeps its schema (Dataset.schema() is the
    # empty-result contract — to_pandas() of a fully-empty Dataset
    # loses columns on this Ray version, see joins._ensure_schema)
    none = snapshot_common(
        rd.from_arrow(_docs([(20, "brand new")])), rd.from_arrow(old)
    )
    assert none.schema().names == ["doc_id", "text"]
    assert none.count() == 0


def _warc_docs():
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 5, 33], pa.int64()),
            "text": pa.array(
                ["alpha beta", "gamma", "delta eps", "zeta"]
            ),
            "lang": pa.array(["en", "de", "en", "es"]),
            "source": pa.array(["s0", "s1", "s2", "s3"]),
        }
    )


def test_warc_frame_parse_roundtrip(ray_session):
    """synth_warc -> warc_records is lossless: every doc comes back
    with its exact page, URL and char length; docs 0/1/5 share chunk 0
    (chunk_docs=32) and 33 lands alone in chunk 1."""
    from vietnamese_ocr_ray.functions.html import synth_html_array
    from vietnamese_ocr_ray.functions.url import synth_url_array
    from vietnamese_ocr_ray.functions.warc import synth_warc, warc_records

    docs = _warc_docs()
    chunks = synth_warc(rd.from_arrow(docs)).to_pandas()
    assert sorted(chunks["chunk_id"]) == [0, 1]
    got = (
        warc_records(synth_warc(rd.from_arrow(docs)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want_html = synth_html_array(docs).to_pylist()
    want_url = synth_url_array(docs).to_pylist()
    assert list(got["doc_id"]) == [0, 1, 5, 33]
    assert list(got["html"]) == want_html
    assert list(got["target_uri"]) == want_url
    assert list(got["content_length"]) == [len(h) for h in want_html]


def test_warc_record_wire_format(ray_session):
    """The chunk bytes are real WARC/1.0 framing: magic, typed headers,
    blank-line separator, double-CRLF record terminator."""
    from vietnamese_ocr_ray.functions.warc import synth_warc

    docs = _warc_docs()
    chunks = synth_warc(rd.from_arrow(docs), chunk_docs=1000).to_pandas()
    blob = chunks["warc"].iloc[0]
    assert blob.startswith("WARC/1.0\r\nWARC-Type: response\r\n")
    assert blob.count("WARC/1.0\r\n") == 4  # one magic per record
    assert "\r\nWARC-Target-URI: https://www." in blob
    assert blob.endswith("\r\n\r\n")
    # records are in doc_id order within a chunk
    first = blob.index("<urn:doc:0>")
    last = blob.index("<urn:doc:33>")
    assert first < last
