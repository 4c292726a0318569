"""Generate the Unicode-realistic text tier (VERDICT r9 task 2).

The driver corpus is 100% ASCII (even for lang='zh' rows), so the whole
text family — shingling, split, length, BPE, PII regexes, SimHash,
winnowing — had never seen a multibyte codepoint. This tool clones a
fixture tier, replacing ``documents.text`` with a deterministic
multilingual corpus that exercises:

  * CJK (Chinese/Japanese), space-segmented AND unsegmented runs
  * emoji — BMP-external codepoints and multi-codepoint ZWJ sequences
  * combining marks — the SAME word in NFC and NFD forms (they are
    different byte strings; exact dedup must NOT merge them, and the
    NFC-normalization query must)
  * RTL scripts (Arabic, Hebrew), Greek/Cyrillic, German sharp-s
  * planted exact duplicates and one-token-edit near-duplicates across
    scripts (so the dedup family has non-trivial output)

Other tables are copied through unchanged. Deterministic (seeded RNG
keyed on doc_id); re-running reproduces the tier bit-for-bit.

    python tools/gen_unicode.py [src_dir] [out_dir]
    SPARK_GRAFT_DUCK_THREADS=1 python tools/check_oracle.py fixtures/sf0.01-unicode
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Per-language word pools. en/de/fr/es keep real stopword-bearing text so
# the x7 quality gates (stopword density, lang allowlist) still pass for a
# realistic fraction of the corpus.
WORDS = {
    "en": ("the of and to in is was for with that it on as are this by an "
           "be at from or have data stream market crash 😀 🚀 value 🇺🇸 "
           "naïve café résumé 👩‍👩‍👧‍👦 model").split(),
    "de": ("der die das und ist von mit für auf nicht ein eine als auch "
           "straße größe weiß heißt über während müssen könnte Bäcker "
           "Übermut zuckersüß").split(),
    "fr": ("le la les de des et est dans pour par sur avec une au été "
           "éléphant àéîôù cœur garçon français señor crème brûlée").split(),
    "es": ("el la los de y en que a es un una por con para su año "
           "señal niño corazón música jalapeño ñandú").split(),
    "zh": "的 是 在 了 有 和 人 这 中 大 市场 数据 模型 价格 股票 分析 汉字 测试 中文处理 自然语言".split(),
    "ja": "の に は を た が で て と し 市場 データ モデル テスト 日本語 処理 自然 言語".split(),
    "ar": "في من على أن هذا إلى عن مع كان ما السوق البيانات النموذج تحليل".split(),
    "he": "של על את זה עם הוא לא אני יש שוק נתונים מודל ניתוח".split(),
    "el": "και το της να που με για είναι από αγορά δεδομένα μοντέλο".split(),
    "ru": "и в не на я что он с как это рынок данные модель анализ".split(),
}
# documents.lang keeps the fixture's label vocabulary where possible
LANGS = ["en", "de", "fr", "es", "zh", "ja", "ar", "he", "el", "ru"]

NFD_WORDS = ["café", "résumé", "naïve", "señor", "über"]  # NFC forms here


def _make_text(rng: random.Random, lang: str, n_tokens: int) -> str:
    toks = [rng.choice(WORDS[lang]) for _ in range(n_tokens)]
    if lang in ("zh", "ja") and rng.random() < 0.3:
        # unsegmented run: one long multibyte token. Capped at 10 chars
        # (~30 UTF-8 bytes): the XXH64-in-SQL replay covers tokens under
        # 32 bytes (no stripe loop, plans/duckhash.py) -- a real corpus
        # cleaner would pre-segment CJK anyway.
        run = "".join(rng.choice(WORDS[lang]) for _ in range(10))
        toks.append(run[:10])
    if lang == "en" and rng.random() < 0.3:
        # NFD-decomposed variant of an NFC word — different bytes, same
        # rendering; the NFC query must normalize them together
        toks.append(unicodedata.normalize("NFD", rng.choice(NFD_WORDS)))
    return " ".join(toks)


def gen_documents(n: int) -> pa.Table:
    doc_ids, texts, langs, sources, n_chars = [], [], [], [], []
    for doc_id in range(n):
        rng = random.Random(990_100 + doc_id)
        lang = LANGS[doc_id % len(LANGS)]
        n_tokens = 20 + rng.randrange(180)
        text = _make_text(rng, lang, n_tokens)
        doc_ids.append(doc_id)
        texts.append(text)
        langs.append(lang)
        sources.append(f"src{doc_id % 20}")
        n_chars.append(len(text))
    # planted structure (deterministic doc_id slots):
    #  - exact duplicates: every 37th doc copies doc-1
    #  - near duplicates: every 41st doc copies doc-2 with ONE token edited
    for doc_id in range(2, n):
        if doc_id % 37 == 0:
            texts[doc_id] = texts[doc_id - 1]
            langs[doc_id] = langs[doc_id - 1]
        elif doc_id % 41 == 0:
            toks = texts[doc_id - 2].split(" ")
            toks[len(toks) // 2] = "改"
            texts[doc_id] = " ".join(toks)
            langs[doc_id] = langs[doc_id - 2]
        n_chars[doc_id] = len(texts[doc_id])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )


# ---- Unicode-realistic customer names (r11, VERDICT r10 task 4) ----
# The r10 tier rewrote documents.text only; customer names stayed ASCII,
# so the fuzzy-join family (SymSpell deletion keys, codepoint
# levenshtein, cluster collapse) had never matched a multibyte name.
# Name pool spans CJK, emoji (incl. a ZWJ sequence), combining marks,
# RTL, Greek/Cyrillic -- plus plain ASCII rows so the zero-padded-prefix
# hot-key degeneracy the cap exists for is still present.
NAME_STEMS = [
    "山田太郎", "佐藤花子", "王小明", "李雷", "张伟", "陈静",
    "Müller", "Bäcker", "Größe", "Φίλιππος", "Αλέξανδρος",
    "Иванов", "Петрова", "محمد", "فاطمة", "כהן", "לוי",
    "José", "García", "François", "Renée", "Ñandú",
    "😀Smith", "Lee🚀", "👩‍👧Park",
]
NFD_STEMS = ["José", "Renée", "François", "Müller"]  # NFC here; NFD twin planted


def gen_customer_names(src_path: str) -> pa.Table:
    """Clone the customer table, replacing c_name with a deterministic
    multilingual name column containing planted structure:

      * exact duplicate names  (every 31st row copies row-1's name)
      * codepoint 1-EDIT pairs (every 23rd row: substitute ONE codepoint
        of row-1's name with '子'; every 29th: append one emoji
        codepoint) -- these MUST fuzzy-match at distance 1
      * NFC/NFD control pairs  (every 43rd row: NFD form of row-1's
        name) -- different codepoints, usually distance 2: must NOT
        match at distance 1 (and exact dedup must keep both)
      * ~half the rows keep the ASCII 'Customer#...' zero-padded form,
        preserving the hot-deletion-key degeneracy the cap targets
    """
    src = pq.read_table(src_path)
    keys = src.column("c_custkey").to_pylist()
    names: list[str] = []
    for pos, key in enumerate(keys):
        rng = random.Random(770_300 + (key if key is not None else -1))
        if pos % 2 == 0:
            names.append(f"Customer#{key:09d}" if key is not None else "Customer#?")
            continue
        stem = rng.choice(NAME_STEMS)
        names.append(f"{stem}#{rng.randrange(100, 1000)}")
    for pos in range(1, len(names)):
        prev = names[pos - 1]
        if pos % 31 == 0:
            names[pos] = prev
        elif pos % 23 == 0:
            cps = list(prev)
            cps[len(cps) // 2] = "子"
            names[pos] = "".join(cps)
        elif pos % 29 == 0:
            names[pos] = prev + "🚀"
        elif pos % 43 == 0:
            names[pos] = unicodedata.normalize("NFD", prev)
    cols = {c: src.column(c) for c in src.column_names}
    cols["c_name"] = pa.array(names, pa.string())
    return pa.table(cols)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)) or ".",
                          "fixtures", "sf0.01-unicode")
    )
    os.makedirs(out, exist_ok=True)
    n_docs = pq.read_metadata(os.path.join(src, "documents.parquet")).num_rows
    for table in TABLES:
        dst = os.path.join(out, f"{table}.parquet")
        if table == "documents":
            pq.write_table(gen_documents(n_docs), dst)
        elif table == "customer":
            pq.write_table(
                gen_customer_names(os.path.join(src, "customer.parquet")), dst
            )
        else:
            shutil.copyfile(os.path.join(src, f"{table}.parquet"), dst)
    docs = pq.read_table(os.path.join(out, "documents.parquet"))
    non_ascii = sum(1 for t in docs.column("text").to_pylist() if not t.isascii())
    print(f"written {out}: {docs.num_rows} docs, {non_ascii} non-ASCII")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
