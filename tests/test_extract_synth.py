"""Byte-identity + determinism tests for extraction and synthesis
(BASELINE.json input_hint: byte-identical extracted text per url)."""

import hashlib

import numpy as np
import pandas as pd

from geomesa_spark.functions import geometry as geo
from geomesa_spark.sources import synth
from geomesa_spark.sources.extract import extract_entities_series, extract_text, extract_text_series


def test_extract_spec_cases():
    cases = {
        b"<p>hello <b>world</b></p>": "hello world",
        b"a<script>x=1;</script>b": "ab",
        b"a<style>p{}</style>b": "ab",
        b"x &amp; y &lt;z&gt; &quot;q&quot; &apos;a&apos;&nbsp;end": "x & y <z> \"q\" 'a' end",
        b"&amp;lt;": "&lt;",  # single-pass: no recursive unescape
        b"  a\r\n\t b  ": "a b",
        b"caf\xc3\xa9": "café",
        b"bad\xffbyte": "bad�byte",
    }
    for html, want in cases.items():
        assert extract_text(html) == want, html
    s = extract_text_series(pd.Series(list(cases.keys()), dtype=object))
    assert s.tolist() == list(cases.values())


def test_pages_deterministic_and_text_invariant():
    ids = np.arange(500)
    a = synth.pages_pdf(ids)
    b = synth.pages_pdf(ids)
    pd.testing.assert_frame_equal(a, b)
    # text column IS extract_text(html), byte for byte
    assert (a["text"] == a["html"].map(extract_text)).all()
    # sha256 goldens are stable across runs
    ha = [hashlib.sha256(t.encode()).hexdigest() for t in a["text"]]
    hb = [hashlib.sha256(t.encode()).hexdigest() for t in b["text"]]
    assert ha == hb
    assert a["lang"].isin(["en", "de", "fr", "es", "pt", "zh"]).all()
    assert (a["lang"] == "en").mean() > 0.4  # zipf-ish toward en


def test_entity_extraction_and_skew():
    ids = np.arange(4000)
    pdf = synth.pages_pdf(ids)
    ents = extract_entities_series(pdf["html"])
    flat = [e for lst in ents for e in lst]
    assert len(flat) > 5000  # avg ~2.5 mentions/page
    gaz = synth.gazetteer_pdf()
    assert set(flat) <= set(gaz["name"])
    hot = sum(1 for e in flat if e in {n for n, _, _ in synth.HOT_CITIES})
    assert 0.12 < hot / len(flat) < 0.30  # ~20% hot-city skew


def test_polygons_fixture_shape():
    polys = synth.polygons()
    cats = pd.Series([p.category for p in polys]).value_counts().to_dict()
    assert cats["grid"] == 150 and cats["concave"] == 25
    assert cats["hole"] == 10 and cats["hot"] == 3 and cats["edge"] == 6
    for p in polys:
        # rings closed
        for r in range(len(p.ring_offsets) - 1):
            s, e = p.ring_offsets[r], p.ring_offsets[r + 1]
            assert (p.coords[s] == p.coords[e - 1]).all()
        # wkt round-trips
        kind, c, off = geo.parse_wkt(p.wkt())
        assert np.allclose(c, p.coords)


def test_pages_spark_distributed(spark):
    df = synth.pages(spark, 300, partitions=4)
    pdf = df.toPandas().sort_values("url").reset_index(drop=True)
    local = synth.pages_pdf(np.arange(300)).sort_values("url").reset_index(drop=True)
    assert (pdf["text"] == local["text"]).all()
    assert (pdf["html"].map(bytes) == local["html"]).all()
    assert len(pdf) == 300


def test_extract_entities_arrow_equals_series():
    """The single-pass Arrow-buffer scan (used by the fused pipeline)
    must agree row-for-row with the per-row findall Series path —
    including multi-byte names, multiple matches per row, no-match rows,
    and a pattern STRADDLING a row boundary (which must NOT match)."""
    import pandas as pd
    import pyarrow as pa

    from geomesa_spark.sources import extract as EX

    pages = [
        b'x<span class="geo" data-name="Paris">y</span>z',
        b"no entities here",
        b'<span class="geo" data-name="Tokyo">a'
        b'<span class="geo" data-name="S\xc3\xa3o Paulo">b',
        b"",
        # ends mid-pattern; next row completes it -> concatenated buffer
        # would contain a spurious cross-row match
        b'tail <span class="geo" data-na',
        b'me="Ghost"> head',
        b'<span class="geo" data-name="K\xffv">bad-utf8 name',
    ]
    col = pa.array(pages, type=pa.binary())
    rows, names = EX.extract_entities_arrow(col)
    want = EX.extract_entities_series(pd.Series(pages))
    flat = [(i, n) for i, lst in want.items() for n in lst]
    assert list(zip(rows.tolist(), names)) == flat
    assert "Ghost" not in names
    # sliced array (non-zero offset) takes the same path
    rows2, names2 = EX.extract_entities_arrow(col.slice(2, 3))
    assert names2 == ["Tokyo", "São Paulo"]
    assert rows2.tolist() == [0, 0]
    # large_binary + chunked inputs
    big = pa.chunked_array([pages[:3], pages[3:]], type=pa.large_binary())
    rows3, names3 = EX.extract_entities_arrow(big)
    assert list(zip(rows3.tolist(), names3)) == flat
