"""PDF text-layer extraction (textcore/pdf.py) + corpus routing."""

from hades_spark.textcore.pdf import make_simple_pdf, pdf_to_text
from hades_spark.textcore.route import detect_format, extract_text


class TestPdfRoundTrip:
    def test_simple_lines(self):
        lines = ["HADES uses Spark.", "Second line here.", "third"]
        assert pdf_to_text(make_simple_pdf(lines)) == "\n".join(lines)

    def test_uncompressed_stream(self):
        lines = ["raw stream line one", "and two"]
        assert pdf_to_text(make_simple_pdf(lines, compress=False)) == \
            "\n".join(lines)

    def test_escaped_characters(self):
        lines = ["parens (nested) and \\backslash", "50% (approx)"]
        assert pdf_to_text(make_simple_pdf(lines)) == "\n".join(lines)

    def test_empty_and_non_pdf(self):
        assert pdf_to_text(b"") == ""
        assert pdf_to_text(None) == ""
        assert pdf_to_text(b"<html>not a pdf</html>") == ""

    def test_literal_escape_rules(self):
        from hades_spark.textcore.pdf import _decode_literal

        assert _decode_literal(rb"a\(b\)c") == "a(b)c"
        assert _decode_literal(rb"tab\there") == "tab\there"
        assert _decode_literal(rb"oct\101l") == "octAl"       # \101 = A
        assert _decode_literal(b"cont\\\nnext") == "contnext"  # line cont.
        assert _decode_literal(rb"unknown\qkeep") == "unknownqkeep"

    def test_hex_string(self):
        # content with a hex-encoded show
        import zlib

        content = b"BT <48656c6c6f> Tj ET"
        pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length "
               + str(len(content)).encode()
               + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
        assert pdf_to_text(pdf) == "Hello"

    def test_corrupt_stream_skipped(self):
        pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length 5 >>"
               b"\nstream\nnotzl\nendstream\nendobj\n")
        assert pdf_to_text(pdf) == ""  # bad stream never raises


class TestPdfRouting:
    def test_route_by_url_and_magic(self):
        lines = ["Alpha uses Beta."]
        pdf = make_simple_pdf(lines)
        assert extract_text("https://x.example/a.pdf", pdf) == lines[0]
        # magic sniff without extension
        assert extract_text("https://x.example/a", pdf) == lines[0]
        # non-pdf binary still goes down the charset ladder
        assert "hello" in extract_text("https://x.example/a.html",
                                       b"<p>hello</p>")

    def test_detect_format_unchanged_for_text(self):
        assert detect_format("a.html", "<p>x</p>") == "html"
        assert detect_format("a.md", "# t") == "markdown"


class TestPdfCorpusPipeline:
    def test_pdf_pages_flow_through_kg(self, spark):
        """VERDICT #9 'done' criterion: pdf pages in the corpus flowing
        through mention/triple extraction with P/R intact."""
        from hades_spark.pipeline.corpus import gen_pages
        from hades_spark.pipeline.kg import canonical_triples, distinct_edges
        from hades_spark.operators.canonicalize import normalize_surface
        from hades_spark.pipeline.corpus import ENTITIES
        from hades_spark.schemas import PAGES

        n = 90
        pages = gen_pages(n, seed=42, compute_text=False, with_pdf=True)
        pdf_urls = [p.url for p in pages if p.url.endswith(".pdf")]
        assert pdf_urls, "corpus produced no pdf pages?"
        df = spark.createDataFrame(
            [(p.url, p.warc_ts, p.html, None, p.lang) for p in pages], PAGES)
        got = {(r["subj"], r["pred"], r["obj"]) for r in
               distinct_edges(canonical_triples(df))
               .select("subj", "pred", "obj").collect()}
        canon_id = {c: min(normalize_surface(v) for v in vs)
                    for c, vs in ENTITIES}
        want = {(canon_id[s], p_, canon_id[o])
                for pg in pages for (s, p_, o) in pg.truth}
        tp = len(got & want)
        assert tp / max(len(got), 1) >= 0.95, sorted(got - want)[:8]
        assert tp / len(want) >= 0.95, sorted(want - got)[:8]

    def test_pdf_page_text_extraction_matches(self):
        from hades_spark.pipeline.corpus import gen_pages
        from hades_spark.textcore.route import extract_text

        pages = gen_pages(60, seed=42, compute_text=True, with_pdf=True)
        pdfs = [p for p in pages if p.url.endswith(".pdf")]
        assert pdfs
        for p in pdfs:
            assert p.html.startswith(b"%PDF-")
            assert extract_text(p.url, p.html) == p.text
            assert p.text.strip()  # real text came out


class TestPdfHardening:
    """Round-4 (VERDICT r3 #3): xref streams, /ObjStm, ToUnicode CMaps,
    TJ kerning, image-only fallthrough."""

    LINES = ["Hello World from CID fonts.", "Second line with (parens)."]

    def test_cid_font_requires_cmap(self):
        """Show strings are 2-byte codes: the latin-1 scan path garbles
        them, so correct output proves the CMap + page-walk path ran."""
        from hades_spark.textcore.pdf import (_scan_all_streams,
                                              make_cid_pdf)

        pdf = make_cid_pdf(self.LINES)
        assert pdf_to_text(pdf) == "\n".join(self.LINES)
        garbled = _scan_all_streams(pdf)
        assert garbled != "\n".join(self.LINES)

    def test_objstm_and_xref_stream(self):
        """PDF 1.5 layout: catalog/pages/page/font packed in an /ObjStm,
        located via a cross-reference STREAM (W tuple, Flate + Up
        predictor). The page tree only exists inside the ObjStm, and the
        CID content only decodes via its font's CMap — end-to-end proof
        both parse."""
        from hades_spark.textcore.pdf import _Doc, make_cid_pdf

        pdf = make_cid_pdf(self.LINES, use_objstm=True)
        assert pdf_to_text(pdf) == "\n".join(self.LINES)
        doc = _Doc(pdf)
        page = doc.get(3)[0]  # lives inside the ObjStm
        assert page["/Type"] == "/Page"
        assert 3 in doc.inline and 3 not in doc.offsets

    def test_tj_kerning_word_gaps(self):
        """A TJ adjustment ≤ -180 inserts a word gap; small kerns don't."""
        from hades_spark.textcore.pdf import _stream_text, make_cid_pdf

        pdf = make_cid_pdf(["Alpha Beta Gamma"], kern=True)
        assert pdf_to_text(pdf) == "Alpha Beta Gamma"
        assert _stream_text(b"BT [(Hel) -20 (lo) -250 (World)] TJ ET") \
            == "Hello World"
        # numbers outside TJ arrays (Td operands) never insert spaces
        assert _stream_text(b"BT 72 -720 Td (One) Tj ET") == "One"

    def test_image_only_pdf_yields_empty(self):
        from hades_spark.textcore.pdf import make_image_only_pdf

        pdf = make_image_only_pdf()
        assert pdf_to_text(pdf) == ""
        # routed extraction is also clean (no crash, empty text)
        assert extract_text("https://x.example/scan.pdf", pdf) == ""

    def test_broken_xref_falls_back_to_scan(self):
        """Corrupt the startxref offset: the brute-scan object index (and
        ultimately the stream scan) still recovers the text."""
        import re

        pdf = make_simple_pdf(["resilient text line"])
        broken = re.sub(rb"startxref\n\d+", b"startxref\n999999999", pdf)
        assert pdf_to_text(broken) == "resilient text line"

    def test_truncated_cid_pdf_never_raises(self):
        from hades_spark.textcore.pdf import make_cid_pdf

        pdf = make_cid_pdf(self.LINES, use_objstm=True)
        for cut in (10, 100, len(pdf) // 2, len(pdf) - 5):
            assert isinstance(pdf_to_text(pdf[:cut]), str)

    def test_bfrange_scalar_and_array(self):
        from hades_spark.textcore.pdf import _parse_tounicode

        cm = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
              b"1 beginbfrange <0001> <0003> <0041> endbfrange\n"
              b"1 beginbfrange <0010> <0011> [<0058> <0059>] endbfrange\n")
        codelen, m = _parse_tounicode(cm)
        assert codelen == 2
        assert (m[1], m[2], m[3]) == ("A", "B", "C")
        assert (m[0x10], m[0x11]) == ("X", "Y")

    def test_classic_xref_prev_chain_validated(self):
        """xref offsets are adopted only when they really point at the
        object (crawled PDFs ship broken tables)."""
        from hades_spark.textcore.pdf import _Doc

        pdf = make_simple_pdf(["xref check"])
        doc = _Doc(pdf)
        assert doc.trailer_root == ("R", 1)
        assert pdf_to_text(pdf) == "xref check"


class TestPdfFuzz:
    def test_mutated_structured_pdfs_never_raise(self):
        """Byte-level mutations of REAL structured fixtures (CID +
        ObjStm + xref stream) — the parser must never raise, whatever
        the mutation corrupts (xref geometry, CMap, Flate payloads)."""
        import random

        from hades_spark.textcore.pdf import make_cid_pdf

        rng = random.Random(7)
        for base in (make_cid_pdf(["Mutation fodder line"]),
                     make_cid_pdf(["More mutation fodder"],
                                  use_objstm=True)):
            for _ in range(60):
                buf = bytearray(base)
                for _ in range(rng.randint(1, 8)):
                    buf[rng.randrange(len(buf))] = rng.randrange(256)
                assert isinstance(pdf_to_text(bytes(buf)), str)

    def test_never_raises_on_arbitrary_bytes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.binary(max_size=400))
        def prop(data):
            # random bytes, optionally with a PDF magic prefix: must never
            # raise, only ever return a string
            assert isinstance(pdf_to_text(data), str)
            assert isinstance(pdf_to_text(b"%PDF-1.4\n" + data), str)

        prop()

    def test_roundtrip_fuzz_printable_lines(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        line = st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=60,
        ).filter(lambda s: s.strip() != "")

        @settings(max_examples=100, deadline=None)
        @given(st.lists(line, min_size=1, max_size=8))
        def prop(lines):
            got = pdf_to_text(make_simple_pdf(lines))
            want = "\n".join(s for s in lines)
            assert got == want

        prop()

    def test_stream_containing_endstream_like_text(self):
        # content whose TEXT contains the word 'endstream' — the regex
        # scan must not truncate mid-stream for the compressed case
        lines = ["before endstream after", "second line"]
        assert pdf_to_text(make_simple_pdf(lines)) == "\n".join(lines)


class TestReviewFixes:
    def test_pdf_url_serving_html_falls_through(self):
        # crawled '.pdf' url serving an HTML soft-404: MAGIC decides, so
        # the charset ladder + html extractor recover the text
        html = b"<html><body><p>Not found, sorry.</p></body></html>"
        out = extract_text("https://host.example/doc.pdf", html)
        assert "Not found" in out

    def test_raw_stream_with_literal_endstream_in_text(self):
        # uncompressed stream whose TEXT contains 'endstream': the
        # regex-scan would truncate at the first occurrence, but the
        # declared /Length is honored and extraction stays exact
        lines = ["before endstream middle", "after"]
        pdf = make_simple_pdf(lines, compress=False)
        assert pdf_to_text(pdf) == "\n".join(lines)


class TestIncrementalAtomicState:
    def test_crash_mid_pairs_write_recovers(self, spark, tmp_path):
        """Simulated crash between rename-to-bak and rename-in of the
        pairs swap: the next update must heal (restore the bak) instead
        of reading a missing table."""
        import pathlib

        from hades_spark.pipeline.incremental_kg import (
            incremental_update, init_state)
        from hades_spark.schemas import PAGES
        from tests.test_incremental_kg import BATCH1, BATCH2, _pages

        inc = str(tmp_path / "atomic")
        init_state(spark, _pages(spark, BATCH1), inc)
        p = pathlib.Path(inc) / "pairs"
        p.rename(p.parent / ".pairs.bak-deadbeef")  # mid-swap crash
        stats = incremental_update(spark, _pages(spark, BATCH2), inc,
                                   batch_id="b2")
        assert not stats["initialized"]
        assert spark.read.parquet(f"{inc}/edges").count() > 0


class TestNestedStreamDict:
    def test_decodeparms_nested_dict(self):
        # /DecodeParms << ... >> inside the stream dict must not hide
        # /FlateDecode from the filter detection
        import zlib

        content = zlib.compress(b"BT (Nested dict works.) Tj ET")
        pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode "
               b"/DecodeParms << /Predictor 1 >> /Length "
               + str(len(content)).encode() + b" >>\nstream\n"
               + content + b"\nendstream\nendobj\n")
        assert pdf_to_text(pdf) == "Nested dict works."


class TestEncodingDifferences:
    def test_differences_remap_extracts_correct_text(self):
        from hades_spark.textcore.pdf import make_differences_pdf

        parts = [
            ("Gr\x01\x02e, \x03rzte!",
             {1: "udieresis", 2: "germandbls", 3: "Adieresis"}),
            ("Caf\x04 \x05 cost", {4: "eacute", 5: "Euro"}),
        ]
        got = pdf_to_text(make_differences_pdf(parts))
        assert got == "Grüße, Ärzte!\nCafé € cost"

    def test_single_char_and_uni_names(self):
        from hades_spark.textcore.pdf import make_differences_pdf

        # /X names of length 1 map to themselves; /uniXXXX parses hex
        parts = [("\x01\x02\x03", {1: "Z", 2: "uni0041", 3: "u00E9"})]
        assert pdf_to_text(make_differences_pdf(parts)) == "ZAé"

    def test_unknown_glyph_name_drops_silently(self):
        from hades_spark.textcore.pdf import make_differences_pdf

        parts = [("a\x01b", {1: "notarealglyphname"})]
        assert pdf_to_text(make_differences_pdf(parts)) == "ab"

    def test_tounicode_wins_over_differences(self):
        # a font carrying BOTH maps must use ToUnicode (authoritative)
        from hades_spark.textcore.pdf import make_cid_pdf

        assert "Alpha" in pdf_to_text(make_cid_pdf(["Alpha"]))


class TestInlineImages:
    def test_inline_image_payload_not_extracted(self):
        from hades_spark.textcore.pdf import make_inline_image_pdf

        got = pdf_to_text(make_inline_image_pdf(
            ["Before the image", "After the image"]))
        assert "Before the image" in got
        assert "After the image" in got
        assert "FAKE" not in got

    def test_ei_byte_pair_inside_payload_skipped(self):
        from hades_spark.textcore.pdf import make_inline_image_pdf

        # payload dense with EI-ish traps: letter-adjacent EI, EI
        # followed by a non-delimiter — only the real " EI " terminates
        payload = b"xEI yEIz (EI) EIX \x00EI\xff innerEI"
        got = pdf_to_text(make_inline_image_pdf(
            ["first line", "second line"], payload=payload))
        assert "first line" in got and "second line" in got

    def test_truncated_inline_image_never_raises(self):
        from hades_spark.textcore.pdf import make_inline_image_pdf

        pdf = make_inline_image_pdf(["kept text", "lost text"])
        # cut inside the payload: ID seen, EI never arrives
        cut = pdf[: pdf.rfind(b" EI")]
        out = pdf_to_text(cut)  # must not raise
        assert isinstance(out, str)

    def test_mutation_fuzz_over_new_fixtures(self):
        """Same harness as TestPdfFuzz: random byte mutations of the new
        fixture classes must never raise."""
        import random

        from hades_spark.textcore.pdf import (make_differences_pdf,
                                              make_inline_image_pdf)

        rng = random.Random(5)
        bases = [
            make_differences_pdf([("m\x01tation", {1: "udieresis"})]),
            make_inline_image_pdf(["fuzz me", "again"]),
        ]
        for base in bases:
            for _ in range(60):
                b = bytearray(base)
                for _ in range(rng.randrange(1, 8)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
                out = pdf_to_text(bytes(b))
                assert isinstance(out, str)


class TestOcrSeam:
    """pdf_page_images + the OCR backend seam (functions/ocr.py) —
    reference behavior: Docling layout+OCR for scanned pages
    (core/extractors/extractors_docling.py:100-227)."""

    def test_image_only_pdf_inventoried(self):
        from hades_spark.textcore.pdf import (make_image_only_pdf,
                                              pdf_page_images)

        imgs = pdf_page_images(make_image_only_pdf())
        assert len(imgs) == 1
        im = imgs[0]
        assert im["page_no"] == 0 and im["name"] == "Im1"
        assert im["filter"] == "/DCTDecode"
        assert im["width"] == 8 and im["height"] == 8
        assert im["page_has_text"] is False
        # raw payload == the embedded fake JPEG, byte-exact (no decode)
        assert im["payload"].startswith(b"\xff\xd8\xff\xe0")
        assert im["payload"].endswith(b"\xff\xd9")

    def test_text_pdf_has_no_images(self):
        from hades_spark.textcore.pdf import pdf_page_images

        assert pdf_page_images(make_simple_pdf(["just text"])) == []

    def test_inline_image_inventoried_with_text_flag(self):
        from hades_spark.textcore.pdf import (make_inline_image_pdf,
                                              pdf_page_images)

        payload = b"\x00\x01rawraster\xff\xfe"
        imgs = pdf_page_images(
            make_inline_image_pdf(["text a", "text b"], payload=payload))
        assert len(imgs) == 1
        assert imgs[0]["name"] == "inline-0"
        assert imgs[0]["payload"] == payload
        assert imgs[0]["page_has_text"] is True  # mixed page

    def test_scanned_fixture_roundtrip(self):
        from hades_spark.functions.ocr import FakeOcrBackend
        from hades_spark.textcore.pdf import (make_scanned_pdf,
                                              pdf_page_images)

        pages = ["Hello scanned page",
                 "Zweite Seite — naïve café 日本",
                 ""]
        data = make_scanned_pdf(pages)
        # no text layer anywhere
        assert pdf_to_text(data) == ""
        imgs = pdf_page_images(data)
        assert [im["page_no"] for im in imgs] == [0, 1, 2]
        assert all(im["page_has_text"] is False for im in imgs)
        got = FakeOcrBackend().recognize([im["payload"] for im in imgs])
        assert got == pages

    def test_real_backend_is_documented_seam(self):
        import pytest

        from hades_spark.functions.ocr import RealOcrBackend

        with pytest.raises(NotImplementedError):
            RealOcrBackend()

    def test_fake_ocr_illegible_and_null(self):
        from hades_spark.functions.ocr import FakeOcrBackend

        b = FakeOcrBackend()
        assert b.recognize([b"\xff\xd8no marker", None, b""]) \
            == ["", "", ""]

    def test_backend_singleton_cached(self):
        from hades_spark.functions.ocr import (FakeOcrBackend,
                                               get_ocr_backend)

        a = get_ocr_backend(FakeOcrBackend)
        assert get_ocr_backend(FakeOcrBackend) is a

    def test_ocr_scanned_pages_e2e(self, spark):
        from hades_spark.functions.ocr import ocr_scanned_pages
        from hades_spark.textcore.pdf import (make_scanned_pdf,
                                              make_simple_pdf)

        rows = [
            ("u1", make_scanned_pdf(["scan one", "scan two"])),
            ("u2", make_simple_pdf(["digital text, no OCR needed"])),
            ("u3", make_scanned_pdf(["third doc"])),
            ("u4", None),
        ]
        df = spark.createDataFrame(rows, "url string, payload binary") \
            .repartition(3)
        out = ocr_scanned_pages(df).orderBy("url", "page_no").collect()
        assert [(r["url"], r["page_no"], r["n_images"], r["text"])
                for r in out] == [
            ("u1", 0, 1, "scan one"), ("u1", 1, 1, "scan two"),
            ("u3", 0, 1, "third doc")]

    def test_include_text_pages_reocrs_everything(self, spark):
        from hades_spark.functions.ocr import ocr_scanned_pages
        from hades_spark.textcore.pdf import make_inline_image_pdf

        # a MIXED page (text layer + inline raster): skipped by default,
        # OCR'd (illegible raster -> '') when include_text_pages=True
        df = spark.createDataFrame(
            [("u1", make_inline_image_pdf(["has text", "more"]))],
            "url string, payload binary")
        assert ocr_scanned_pages(df).count() == 0
        out = ocr_scanned_pages(df, include_text_pages=True).collect()
        assert [(r["url"], r["page_no"], r["text"]) for r in out] \
            == [("u1", 0, "")]

    def test_mutation_fuzz_page_images_never_raises(self):
        import random

        from hades_spark.textcore.pdf import (make_scanned_pdf,
                                              pdf_page_images)

        rng = random.Random(11)
        base = make_scanned_pdf(["fuzz page", "two"])
        for _ in range(60):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            out = pdf_page_images(bytes(b))
            assert isinstance(out, list)

    def test_page_images_arbitrary_bytes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from hades_spark.textcore.pdf import pdf_page_images

        @settings(max_examples=100, deadline=None)
        @given(st.binary(max_size=300))
        def prop(data):
            assert isinstance(pdf_page_images(data), list)
            assert isinstance(
                pdf_page_images(b"%PDF-1.4\n" + data), list)

        prop()
