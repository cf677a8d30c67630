"""A6 word-break tokenizer goldens (reference
WordBreakTokenizerTest semantics on the built-in demo dictionary)."""

import os
import time

import pytest

from peterman_search_engine_spark.functions.wordbreak import (
    DEMO_FREQ,
    word_break,
    word_break_udf,
)


def test_basic_segmentation():
    # mirrors the reference's canonical case: stop words removed after
    # the split ("i", "it", "is" are stop words)
    assert word_break("ilikecomputerscience", DEMO_FREQ) == [
        "like", "computer", "science",
    ]


def test_probability_maximization():
    # "anews" could split a-news or an-ews(invalid); DP must pick the
    # valid max-probability path
    assert word_break("thenewstoday", DEMO_FREQ) == ["news", "today"]


def test_case_insensitive():
    assert word_break("ILikeComputerScience", DEMO_FREQ) == [
        "like", "computer", "science",
    ]


def test_empty():
    assert word_break("", DEMO_FREQ) == []
    assert word_break("   ", DEMO_FREQ) == []


def test_unbreakable_raises():
    with pytest.raises(ValueError):
        word_break("zzzqqqxxx", DEMO_FREQ)


def test_udf(spark):
    df = spark.createDataFrame(
        [(0, "ilikecomputerscience"), (1, "stemmingisimportant")],
        "id long, text string",
    )
    rows = {r["id"]: r["toks"] for r in df.select(
        "id", word_break_udf()(df.text).alias("toks")
    ).collect()}
    assert rows[0] == ["like", "computer", "science"]
    assert rows[1] == ["stemming", "important"]


def test_japanese_dictionary():
    """A7 JapaneseWordBreakTokenizer semantics: the same DP over a
    different (Japanese) frequency dictionary — the reference's A7 is
    A6 with the 60,993-entry Japanese Twitter dict swapped in
    (JapaneseWordBreakTokenizer.java:94-163). Unicode goes through the
    same Python DP (frequencies favor the multi-char segmentation)."""
    freq = {
        "自然": 100, "言語": 90, "処理": 80, "自然言語": 500,
        "です": 70, "は": 5, "楽しい": 60,
    }
    assert word_break("自然言語処理", freq) == ["自然言語", "処理"]
    assert word_break("自然言語処理は楽しいです", freq) == [
        "自然言語", "処理", "は", "楽しい", "です",
    ]


def test_japanese_udf(spark):
    freq = {"自然言語": 500, "処理": 80}
    df = spark.createDataFrame([(0, "自然言語処理")], "id long, text string")
    rows = df.select(word_break_udf(freq)(df.text).alias("toks")).collect()
    assert rows[0]["toks"] == ["自然言語", "処理"]


# ---------------------------------------------------------------------------
# Reference-scale stress goldens (WordBreakTokenizerTest.java:24-45):
# ~900-char no-space Sherlock Holmes passages segmented over the
# reference's real 82,765-word frequency dictionary within the
# reference's 20-second budget. The dictionary file is read from the
# reference checkout (public data); skipped when absent so the repo
# stays standalone.
# ---------------------------------------------------------------------------

REF_DICT = (
    "/root/reference/src/main/resources/cs221_frequency_dictionary_en.txt"
)

LONG1_TEXT = (
    "tosherlockholmessheisalwaysthewomanihaveseldomheardhimmentionherunder"
    "anyothernameinhiseyessheeclipsesandpredominatesthewholeofhersexitwasno"
    "tthathefeltanyemotionakintoloveforireneadlerallemotionsandthatonepartic"
    "ularlywereabhorrenttohiscoldprecisebutadmirablybalancedmindhewasitakeit"
    "themostperfectreasoningandobservingmachinethattheworldhasseenbutasalove"
    "rhewouldhaveplacedhimselfinafalsepositionheneverspokeofthesofterpassion"
    "ssavewithagibeandasneertheywereadmirablethingsfortheobserverexcellentfo"
    "rdrawingtheveilfrommenmotivesandactionsbutforthetrainedreasonertoadmits"
    "uchintrusionsintohisowndelicateandfinelyadjustedtemperamentwastointrodu"
    "ceadistractingfactorwhichmightthrowadoubtuponallhismentalresultsgritina"
    "sensitiveinstrumentoracrackinoneofhisownhighpowerlenseswouldnotbemoredi"
    "sturbingthanastrongemotioninanaturesuchashisandyettherewasbutonewomanto"
    "himandthatwomanwasthelateireneadlerofdubiousandquestionablememory"
)
LONG1_EXPECTED = (
    "sherlock holmes always woman seldom heard mention name eyes eclipses "
    "predominates whole sex felt emotion akin love irene adler emotions one "
    "particularly abhorrent cold precise admirably balanced mind take "
    "perfect reasoning observing machine world seen lover would placed "
    "false position never spoke softer passions save gibe sneer admirable "
    "things observer excellent drawing veil men motives actions trained "
    "reasoner admit intrusions delicate finely adjusted temperament "
    "introduce distracting factor might throw doubt upon mental results "
    "grit sensitive instrument crack one high power lenses would disturbing "
    "strong emotion nature yet one woman woman late irene adler dubious "
    "questionable memory"
).split()

LONG2_TEXT = (
    "ihadseenlittleofholmeslatelymymarriagehaddriftedusawayfromeachothermyo"
    "wncompletehappinessandthehomecentredinterestswhichriseuparoundthemanwh"
    "ofirstfindshimselfmasterofhisownestablishmentweresufficienttoabsorball"
    "myattentionwhileholmeswholoathedeveryformofsocietywithhiswholesoulrema"
    "inedinourlodgingsinbakerstreetburiedamonghisoldbooksandalternatingfrom"
    "weektoweekbetweencocaineandambitionthedrowsinessofthedrugandthefiercee"
    "nergyofhisownkeennaturehewasstillaseverdeeplyattractedbythestudyofcrim"
    "eandoccupiedhisimmensefacultiesandextraordinarypowersofobservationinfo"
    "llowingoutthosecluesandclearingupthosemysterieswhichhadbeenabandonedas"
    "hopelessbytheofficialpolicefromtimetotimeiheardsomevagueaccountofhisdo"
    "ingsofhissummonstoodessainthecaseofthemurderofhisclearingupofthesingul"
    "artragedyoftheatkinsonbrothersattrincomaleeandfinallyofthemissionwhich"
    "hehadaccomplishedsodelicatelyandsuccessfullyforthereigningfamilyofholl"
    "andbeyondthesesignsofhisactivityhoweverwhichimerelysharedwithalltherea"
    "dersofthedailypressiknewlittleofmyformerfriendandcompanion"
)
LONG2_EXPECTED = (
    "seen little holmes lately marriage drifted us away complete happiness "
    "home centred interests rise around man first finds master "
    "establishment sufficient absorb attention holmes loathed every form "
    "society whole soul remained lodgings baker street buried among old "
    "books alternating week week cocaine ambition drowsiness drug fierce "
    "energy keen nature still ever deeply attracted study crime occupied "
    "immense faculties extraordinary powers observation following clues "
    "clearing mysteries abandoned hopeless official police time time heard "
    "vague account doings summons odessa case murder clearing singular "
    "tragedy atkinson brothers trincomalee finally mission accomplished "
    "delicately successfully reigning family holland beyond signs activity "
    "however merely shared readers daily press knew little former friend "
    "companion"
).split()


@pytest.fixture(scope="module")
def ref_dict():
    if not os.path.exists(REF_DICT):
        pytest.skip("reference dictionary not available")
    from peterman_search_engine_spark.functions.wordbreak import (
        load_frequency_dict,
    )

    freq = load_frequency_dict(REF_DICT)
    assert len(freq) == 82765  # WBT:44-45 dictionary size
    assert "the" in freq  # BOM must not corrupt the first entry
    return freq


@pytest.mark.parametrize(
    "text,expected",
    [(LONG1_TEXT, LONG1_EXPECTED), (LONG2_TEXT, LONG2_EXPECTED)],
    ids=["long1", "long2"],
)
def test_wordbreak_stress_reference_dict(ref_dict, text, expected):
    t0 = time.perf_counter()
    got = word_break(text, ref_dict)
    elapsed = time.perf_counter() - t0
    assert got == expected
    assert elapsed < 20.0  # reference budget (20 s JUnit timeout)
