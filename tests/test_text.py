"""Name-canonicalization parity with the reference clean()
(similar_anime.py:242-276)."""

import re
import string
import unicodedata

from anime_recommendations_tpu.utils.text import clean_name, clean_names


def reference_clean(item):
    """Verbatim re-derivation of the reference algorithm as an oracle."""
    irregular = ["★", "♥", "☆", "♡", "½", "ß", "²"]
    for irr in irregular:
        if irr in item:
            item = item.replace(irr, " ")
    x = str(item).translate({ord(c): None for c in string.whitespace})
    x = re.sub(r"\W+", "", x)
    x = "".join(
        c for c in unicodedata.normalize("NFKD", x) if not unicodedata.combining(c)
    )
    return x.lower()


CASES = [
    "YuuYuu☆Hakusho!",
    "SilentMöbius",
    "Re:Zero kara Hajimeru Isekai Seikatsu",
    "Fate/stay night: Unlimited Blade Works",
    "Steins;Gate 0",
    "Yu☆Gi☆Oh! 5D's",
    "K-On!!",
    "Kono Subarashii Sekai ni Shukufuku wo! 2",
    "½ Prince",
    "Weiß Kreuz",
    "A² whitespace\ttest\n",
]


def test_matches_reference_oracle():
    for case in CASES:
        assert clean_name(case) == reference_clean(case), case


def test_known_values():
    assert clean_name("YuuYuu☆Hakusho!") == "yuuyuuhakusho"
    assert clean_name("SilentMöbius") == "silentmobius"
    assert clean_name("  Cowboy  Bebop ") == "cowboybebop"


def test_list_form():
    assert clean_names(["A B", "C☆D"]) == ["ab", "cd"]
