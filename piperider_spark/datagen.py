"""Deterministic synthetic transcript generator (seeded; no external data).

Produces the north-rule input table
``transcripts(conv_id string, turn_idx int32, role string, text string,
tool string, ts timestamp)`` per BASELINE.json input_hint and FIXTURES.md §1:

* Zipf-skewed conversation lengths (a few convs with 10^3+ turns) so the
  salted-repartition / AQE-skew paths are actually exercised;
* ~2% invalid roles; NULL / empty / over-long / repetitive / gibberish /
  non-English / PII-bearing / toxic turn texts in fixed proportions;
* ~5% malformed tool-call JSON on role=tool turns;
* timestamps monotone within conv, spanning > 4 years overall (drives the
  yearly/monthly/daily datetime-histogram grains, profiler.py:1421-1454).

Everything is drawn from numpy Generator(seed) — same seed, same bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

EN_SENTENCES = [
    "The pipeline finished loading the data and all of the checks passed.",
    "Please review the report and let me know if you have any questions.",
    "It was a quiet morning and the team agreed to ship the release.",
    "The model is trained on a large corpus of text from the public web.",
    "I think that the results are promising but we need more evaluation.",
    "You can find the documentation in the repository under the docs folder.",
    "They decided to refactor the module so that it is easier to test.",
    "The query planner pushed the filter down to the scan and it was fast.",
    "We will schedule the migration for next week after the backup runs.",
    "This is a simple sentence that should pass all of the quality rules.",
]
FR_SENTENCES = [
    "Le rapport est prêt et vous pouvez le consulter dans le dossier partagé.",
    "Nous avons besoin de plus de temps pour terminer cette analyse des données.",
    "La réunion est prévue pour la semaine prochaine avec toute l'équipe.",
]
DE_SENTENCES = [
    "Der Bericht ist fertig und die Ergebnisse sind nicht schlecht geworden.",
    "Ich werde die Daten morgen mit dem neuen Modell noch einmal prüfen.",
    "Die Besprechung findet nächste Woche mit dem ganzen Team statt.",
]
ES_SENTENCES = [
    "El informe está listo y los resultados son muy buenos para el equipo.",
    "Necesitamos más tiempo para terminar el análisis de los datos nuevos.",
    "La reunión es la próxima semana con todo el equipo del proyecto.",
]
CJK_SENTENCES = [
    "これはテストの文章でありデータの品質を確認するために使われます。",
    "数据管道已经完成加载所有检查都通过了请查看报告。",
]
TOXIC_WORDS = ["frak", "gorram", "smeghead", "dirtbag", "scumbucket"]
TOOL_NAMES = ["search", "calculator", "code_run", "fetch_url", "db_query"]

EPOCH = np.datetime64("2019-01-15T00:00:00")
SPAN_SECONDS = int(5.2 * 365.25 * 86400)  # > 4 years

CATEGORIES = np.array(
    ["clean", "non_en", "empty", "null", "long", "repetitive", "gibberish", "pii", "toxic"]
)
CAT_P = np.array([0.70, 0.08, 0.02, 0.02, 0.02, 0.04, 0.04, 0.05, 0.03])


def _gibberish(rng: np.random.Generator, n_chars: int) -> str:
    letters = np.array(list("bcdfghjklmnpqrstvwxz"))
    return "".join(rng.choice(letters, size=n_chars))


def _pii_text(rng: np.random.Generator) -> str:
    base = EN_SENTENCES[int(rng.integers(len(EN_SENTENCES)))]
    kind = int(rng.integers(5))
    if kind == 0:
        pii = f"reach me at user{int(rng.integers(1000))}@example{int(rng.integers(10))}.com"
    elif kind == 1:
        pii = f"my ssn is {rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"
    elif kind == 2:
        pii = f"call {rng.integers(200, 999)}-{rng.integers(200, 999)}-{rng.integers(1000, 9999)} today"
    elif kind == 3:
        key = "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz0123456789"), size=24))
        pii = f"use sk-{key} as the secret"
    else:
        pii = f"the server is at {rng.integers(1, 255)}.{rng.integers(0, 255)}.{rng.integers(0, 255)}.{rng.integers(1, 255)}"
    return f"{base} {pii}"


def _make_text(rng: np.random.Generator, cat: str) -> str | None:
    if cat == "null":
        return None
    if cat == "empty":
        return "" if rng.random() < 0.5 else "   "
    if cat == "clean":
        k = int(rng.integers(1, 5))
        return " ".join(EN_SENTENCES[int(i)] for i in rng.integers(0, len(EN_SENTENCES), k))
    if cat == "non_en":
        bank = [FR_SENTENCES, DE_SENTENCES, ES_SENTENCES, CJK_SENTENCES][int(rng.integers(4))]
        k = int(rng.integers(1, 3))
        return " ".join(bank[int(i)] for i in rng.integers(0, len(bank), k))
    if cat == "long":
        s = EN_SENTENCES[int(rng.integers(len(EN_SENTENCES)))]
        reps = 8200 // len(s) + 2
        return " ".join([s] * reps)
    if cat == "repetitive":
        vocab = ["yes", "ok", "sure", "fine"]
        n = int(rng.integers(25, 60))
        words = rng.choice(vocab[: int(rng.integers(1, 3))], size=n)
        return " ".join(words)
    if cat == "gibberish":
        return " ".join(_gibberish(rng, int(rng.integers(4, 10))) for _ in range(int(rng.integers(8, 20))))
    if cat == "pii":
        return _pii_text(rng)
    if cat == "toxic":
        base = EN_SENTENCES[int(rng.integers(len(EN_SENTENCES)))]
        word = TOXIC_WORDS[int(rng.integers(len(TOXIC_WORDS)))]
        return f"{base} you {word} !"
    raise AssertionError(cat)


def generate_transcripts(n_turns: int = 10_000, seed: int = 42) -> pd.DataFrame:
    """~n_turns rows, deterministic for (n_turns, seed)."""
    rng = np.random.default_rng(seed)

    # Zipf-skewed conversation lengths, clipped to [2, 4000]
    lengths: list[int] = []
    total = 0
    while total < n_turns:
        n = int(min(rng.zipf(1.35), 4000))
        n = max(n, 2)
        lengths.append(n)
        total += n
    lens = np.array(lengths)
    n_rows = int(lens.sum())
    conv_ids = np.repeat(
        np.array([f"conv-{seed:04x}-{i:08d}" for i in range(len(lens))], dtype=object), lens
    )
    turn_idx = np.concatenate([np.arange(n, dtype=np.int32) for n in lens])

    # roles: system first, then user/assistant alternating, ~8% tool turns,
    # ~2% corrupted to invalid values
    base_roles = np.where(turn_idx == 0, "system", np.where(turn_idx % 2 == 1, "user", "assistant"))
    tool_mask = (rng.random(n_rows) < 0.08) & (turn_idx > 0)
    roles = np.where(tool_mask, "tool", base_roles).astype(object)
    bad_role = rng.random(n_rows) < 0.02
    bad_choices = np.array(["robot", "", "USER", "agent"], dtype=object)
    roles[bad_role] = bad_choices[rng.integers(0, len(bad_choices), int(bad_role.sum()))]

    cats = rng.choice(CATEGORIES, size=n_rows, p=CAT_P)
    texts = np.array([_make_text(rng, c) for c in cats], dtype=object)

    # tool payloads for role=tool rows; ~5% malformed JSON, ~5% missing name
    tools = np.full(n_rows, None, dtype=object)
    tool_rows = np.flatnonzero(roles == "tool")
    for i in tool_rows:
        name = TOOL_NAMES[int(rng.integers(len(TOOL_NAMES)))]
        r = rng.random()
        if r < 0.05:
            tools[i] = '{"name": "%s", "arguments": {' % name  # truncated
        elif r < 0.10:
            tools[i] = '{"arguments": {"q": "x"}}'  # missing name
        else:
            tools[i] = '{"name": "%s", "arguments": {"q": "value %d"}}' % (name, int(rng.integers(100)))

    # timestamps: conv start uniform over the span, +1..300s per turn, monotone
    conv_start = rng.integers(0, SPAN_SECONDS, size=len(lens))
    step = rng.integers(1, 300, size=n_rows)
    start_rep = np.repeat(conv_start, lens)
    # cumulative within conv: global cumsum minus cumsum at conv start
    cum = np.cumsum(step)
    conv_first = np.concatenate([[0], np.cumsum(lens)[:-1]])
    offset = cum - np.repeat(cum[conv_first] - step[conv_first], lens)
    ts = EPOCH + (start_rep + offset).astype("timedelta64[s]")

    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx.astype(np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts.astype("datetime64[us]"),
        }
    )


def write_transcripts_parquet(
    path: str, n_turns: int = 10_000, seed: int = 42, row_group_size: int | None = None
) -> str:
    """Write the synthetic table. ``row_group_size`` controls scan
    parallelism: Spark splits a parquet file only at row-group boundaries,
    so a single-group file would serialize the whole read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_transcripts(n_turns, seed)
    if row_group_size is None:
        row_group_size = max(len(pdf) // 64, 4096)
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        path,
        row_group_size=row_group_size,
    )
    return path
