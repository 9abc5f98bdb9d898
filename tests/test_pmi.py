"""pmi_collocations (llm/text.py): a genuine collocation must outrank a
frequent-but-independent bigram; exact sufficient statistics."""

from __future__ import annotations

from aci_export_spark.llm import text as T


def test_collocation_outranks_independent_pair(spark):
    # "new york" always together (strong collocation); "the cat" both very
    # frequent but combined only sometimes (weak PMI).
    docs = []
    for i in range(10):
        docs.append((i, "new york " + "the " * 6 + "cat " * 2 + "the cat"))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = T.pmi_collocations(df, "doc_id", "text", min_count=5, k=10).collect()
    by_gram = {r["gram"]: r for r in rows}
    assert "new york" in by_gram and "the cat" in by_gram
    assert by_gram["new york"]["rank"] < by_gram["the cat"]["rank"]
    ny = by_gram["new york"]
    # exact stats: 10 docs x 1 occurrence; c_x = c_y = 10
    assert ny["c_xy"] == 10 and ny["c_x"] == 10 and ny["c_y"] == 10
    # ratio num/den must decode back to the rational definition
    assert ny["pmi_num"] % ny["c_xy"] == 0


def test_min_count_filters(spark):
    df = spark.createDataFrame(
        [(0, "rare pair " + "filler word " * 10)], ["doc_id", "text"]
    )
    rows = T.pmi_collocations(df, "doc_id", "text", min_count=5, k=10).collect()
    assert all(r["c_xy"] >= 5 for r in rows)
    assert "rare pair" not in {r["gram"] for r in rows}


def test_luhn_known_vectors(spark):
    from aci_export_spark.llm import text as T

    rows = [
        (0, "pay with 4111111111111111 thanks"),       # canonical valid visa
        (1, "pay with 4111111111111112 thanks"),       # off-by-one: invalid
        (2, "order 79927398713 is too short, 79927398713000000000 too long"),
        (3, "amex 378282246310005 and bogus 1234567890123456"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.luhn_card_stats(df, "doc_id", "text").collect()}
    assert got[0]["n_candidates"] == 1 and got[0]["n_luhn_valid"] == 1
    assert got[1]["n_candidates"] == 1 and got[1]["n_luhn_valid"] == 0
    # 11-digit and 20-digit runs are outside card length entirely
    assert got[2]["n_candidates"] == 0
    # amex (15 digits) valid; the ascending run fails the checksum
    assert got[3]["n_candidates"] == 2 and got[3]["n_luhn_valid"] == 1


def test_readability_hand_counts(spark):
    from aci_export_spark.llm import text as T

    rows = [
        (0, "the cat sat"),                       # 3 words, 1 syllable each
        (1, "extraordinary filtering considered"),  # polysyllabic, long words
        (2, "zzz xyz"),                           # 'xyz' has vowel-group y; zzz floors to 1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in T.readability_profile(df, "doc_id", "text").collect()}
    assert got[0]["n_words"] == 3 and got[0]["n_syllables"] == 3
    assert got[0]["n_polysyllables"] == 0 and got[0]["n_long_words"] == 0
    # extraordinary: e-xtr-ao-rd-i-n-a-r-y -> vowel groups e,ao,i,a,y = 5
    assert got[1]["n_polysyllables"] == 3 and got[1]["n_long_words"] == 3
    assert got[2]["n_syllables"] == 2  # floor-1 for zzz, y-group for xyz
