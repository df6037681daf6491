"""Randomized differential fuzzing: C++ filter vs Python oracle.

Random OpenAlex-ish records with adversarial content — unicode escapes,
quotes/backslashes, nested unknown fields, shuffled key order, missing
keys, malformed lines — must produce byte-identical parsed output from
both implementations (SURVEY.md §4: property tests for the ingest
filter).
"""

import json
import random

from abstracts_search_tpu.ingest import OaJsonlFilter, filter_works_lines

WORDS = [
    "alpha", "beta", 'quo"te', "back\\slash", "café", "日本語", "tab\there",
    "new\nline", "emoji🎉", "", "ℵ∞", "a" * 50,
]
LANGS = ["en", "fr", "de", None, "en-GB", ""]


def _random_record(rnd: random.Random) -> dict:
    rec = {}
    items = []
    if rnd.random() < 0.95:
        items.append(("id", f"https://openalex.org/W{rnd.randrange(10**9)}"))
    if rnd.random() < 0.9:
        items.append(("title", rnd.choice([None, rnd.choice(WORDS), "A Study"])))
    if rnd.random() < 0.9:
        items.append(("language", rnd.choice(LANGS)))
    if rnd.random() < 0.95:
        if rnd.random() < 0.15:
            inv = None
        else:
            inv = {}
            for _ in range(rnd.randrange(0, 6)):
                w = rnd.choice(WORDS)
                inv[w] = sorted(rnd.sample(range(-2, 12), rnd.randrange(1, 4)))
        items.append(("abstract_inverted_index", inv))
    # noise fields with nasty nesting
    for i in range(rnd.randrange(0, 4)):
        items.append((
            f"noise{i}",
            rnd.choice([
                123, -4.5e6, True, False, None, "str{with}[brackets]",
                {"nested": [{"deep": "}\"]["}, [1, [2, [3]]]]},
                [],
                {},
            ]),
        ))
    rnd.shuffle(items)
    rec.update(items)
    return rec


import pytest


@pytest.mark.parametrize("seed", [1234, 777, 424242])
def test_fuzz_differential(seed):
    rnd = random.Random(seed)
    lines = []
    for i in range(800):
        if rnd.random() < 0.05:
            lines.append(rnd.choice(['{"id": broken', "[1,2]", "", "null", "{}"]))
        else:
            lines.append(json.dumps(_random_record(rnd), ensure_ascii=rnd.random() < 0.5))

    py_out = list(filter_works_lines(lines))
    with OaJsonlFilter() as f:
        cpp_out = f.filter_text("\n".join(lines) + "\n")

    assert cpp_out == py_out
    assert len(py_out) > 50  # the generator actually produces emittable records
