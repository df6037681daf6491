"""Ingest filter: property tests + C++/Python differential tests.

Behavior contract from the reference native filter (SURVEY.md §3.3):
language drop, null-abstract drop, inverted-index reconstruction.
"""

import json

import pytest

from abstracts_search_tpu.ingest import OaJsonlFilter, filter_works_lines
from abstracts_search_tpu.ingest.oa_filter import ensure_filter_built


def _rec(**kw):
    base = {
        "id": "https://openalex.org/W1",
        "title": "A Title",
        "language": "en",
        "abstract_inverted_index": {"hello": [0], "world": [1]},
        "publication_year": 2020,
        "authorships": [{"author": {"display_name": "X"}}],
    }
    base.update(kw)
    return base


def _run_py(records):
    return list(filter_works_lines(json.dumps(r) for r in records))


class TestPythonFilter:
    def test_basic_emit(self):
        out = _run_py([_rec()])
        assert out == [{"id": "https://openalex.org/W1", "document": "A Title hello world"}]

    def test_drop_non_english(self):
        assert _run_py([_rec(language="fr")]) == []

    def test_drop_null_language(self):
        assert _run_py([_rec(language=None)]) == []

    def test_keep_missing_language(self):
        rec = _rec()
        del rec["language"]
        assert len(_run_py([rec])) == 1

    def test_drop_null_abstract(self):
        assert _run_py([_rec(abstract_inverted_index=None)]) == []

    def test_drop_empty_abstract(self):
        assert _run_py([_rec(abstract_inverted_index={})]) == []

    def test_null_title_abstract_only(self):
        out = _run_py([_rec(title=None)])
        assert out[0]["document"] == "hello world"

    def test_reconstruction_order_and_gaps(self):
        inv = {"c": [5], "a": [0], "b": [2, 3]}
        out = _run_py([_rec(abstract_inverted_index=inv, title=None)])
        assert out[0]["document"] == "a b b c"

    def test_reconstruction_duplicate_position_last_wins(self):
        # dict order: "x" placed first, then "y" overwrites position 0
        inv = {"x": [0], "y": [0, 1]}
        out = _run_py([_rec(abstract_inverted_index=inv, title=None)])
        assert out[0]["document"] == "y y"

    def test_negative_positions_ignored(self):
        inv = {"w": [-3, 0]}
        out = _run_py([_rec(abstract_inverted_index=inv, title=None)])
        assert out[0]["document"] == "w"

    def test_malformed_line_skipped(self):
        lines = ["{not json", json.dumps(_rec())]
        assert len(list(filter_works_lines(lines))) == 1

    def test_missing_id_dropped(self):
        rec = _rec()
        del rec["id"]
        assert _run_py([rec]) == []


class TestNativeFilter:
    @pytest.fixture(scope="class")
    def binary(self):
        return ensure_filter_built()

    def _run_cpp(self, records_or_lines):
        lines = [
            r if isinstance(r, str) else json.dumps(r) for r in records_or_lines
        ]
        with OaJsonlFilter() as f:
            return f.filter_text("\n".join(lines) + "\n")

    def test_differential_vs_python(self, binary):
        """C++ and Python implementations agree on a mixed corpus."""
        records = [
            _rec(),
            _rec(id="W2", language="de"),
            _rec(id="W3", language=None),
            _rec(id="W4", abstract_inverted_index=None),
            _rec(id="W5", abstract_inverted_index={}),
            _rec(id="W6", title=None),
            _rec(id="W7", abstract_inverted_index={"z": [2], "a": [0]}),
            _rec(id="W8", title="Escaped \"quotes\" and \\ backslash",
                 abstract_inverted_index={"café": [0], "naïve": [1]}),
            _rec(id="W9", abstract_inverted_index={"x": [0], "y": [0]}),
            {"id": "W10"},  # no abstract at all
        ]
        rec_no_lang = _rec(id="W11")
        del rec_no_lang["language"]
        records.append(rec_no_lang)

        py = _run_py(records)
        cpp = self._run_cpp(records)
        assert cpp == py
        assert len(py) == 6  # W1, W6, W7, W8, W9, W11

    def test_malformed_lines_skipped(self, binary):
        out = self._run_cpp(["{broken", json.dumps(_rec()), "[1,2,3]"])
        assert len(out) == 1

    def test_nested_unknown_fields_skipped(self, binary):
        rec = _rec(weird={"a": [{"b": "}{[]\""}], "c": {"d": [1, {"e": None}]}})
        out = self._run_cpp([rec])
        assert out == _run_py([rec])

    def test_large_stream(self, binary):
        records = [_rec(id=f"W{i}", language="en" if i % 3 else "fr") for i in range(1000)]
        out = self._run_cpp(records)
        assert len(out) == len([r for r in records if r["language"] == "en"])
