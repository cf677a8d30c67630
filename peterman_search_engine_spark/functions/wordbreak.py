"""A6/A7: DP word-break tokenizer for space-free text.

Reference semantics (``analysis/WordBreakTokenizer.java:89-159``):
lowercase the input, find the segmentation into dictionary words that
maximizes Π p(word) — computed as a log-probability sum
(``WBT:108-113``) over a word-frequency dictionary — then drop stop
words from the result (``WBT:152-154``); raise if the text cannot be
fully segmented (``WBT:139-141``). The Japanese variant
(``analysis/JapaneseWordBreakTokenizer.java:94-163``) is the same DP
with a different dictionary, so this module takes the dictionary as
data: pass any ``{word: count}`` mapping (e.g. loaded from a
frequency TSV/text file via :func:`load_frequency_dict`).

The DP is O(n · maxlen) per string and runs inside an Arrow pandas
UDF (the dictionary ships once per executor via the closure /
broadcast, not per row). A 2000-word built-in English demo dictionary
backs tests; production use supplies a real frequency file.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from .stopwords import STOP_WORDS

# Compact English demo dictionary: (word, relative frequency weight).
# Weights are Zipf-ish ranks, enough for deterministic golden tests.
_DEMO_WORDS = """the of and to a in for is on that by this with i you it
not or be are from at as your all have new more an was we will home can
us about if page my has search free but our one other do no information
time they site he up may what which their news out use any there see c
so only his when here who web also now help get pm view online first am
been would how were me services some these click its like service than
find price date back top people had list name just over state year day
into email two health world next used go work last most products music
buy data make them should product system post her city add policy
number such please available copyright support message after best
software then good video well where info rights public books high
school through each links she review years order very privacy book
items company read group sex need many user said de does set under
general research university january mail full map reviews program life
know games way days management part could great united hotel real item
international center must store travel comments made development report
member details line terms before hotels did send right type because
local those using results office education national car design take
posted internet address community within states area want phone shipping
reserved subject between forum family long based code show even black
check special prices website index being women much sign file link open
today technology south case project same pages uk version section own
found sports house related security both county american photo game
members power while care network down computer systems three total
place end following download him without per access think north
resources current posts big media law control water history pictures
size art personal since including guide shop directory board location
change white text small rating rate government children during usa
return students shopping account times sites level digital profile
previous form events love old john main call hours image department
title description non insurance another why shall property class cd
still money quality every listing content country private little visit
save tools low reply customer december compare movies include college
value article york man card jobs provide food source author different
press learn sale around print course job canada process teen room stock
training too credit point join science men categories advanced west
sales look english left team estate box conditions select windows
photos gay thread week category note live large gallery table register
however june october november market library really action start series
model features air industry plan human provided tv yes required second
hot accessories cost movie forums march la september better say
questions july yahoo going medical test friend come dev server pc study
application cart staff articles san feedback again play looking issues
april never users complete street topic comment financial things
working against standard tax person below mobile less got blog party
payment equipment login student let programs offers legal above recent
park stores side act problem red give memory performance social august
quote language story sell options experience rates create key body
young america important field few east paper single ii age activities
club example girls additional password latest something road gift
question changes night ca hard texas oct pay four poker status browse
issue range building seller court february always result audio light
write war nov offer blue groups al easy given files event release
analysis request fax china making picture needs possible might
professional yet month major star areas future space committee hand sun
cards problems london washington meeting rss become interest id child
keep enter california porn share similar garden schools million added
reference companies listed baby learning energy run delivery net
popular term film stories put computers journal reports co try welcome
central images president notice god original head radio until cell
color self council away includes track australia discussion archive
once others entertainment agreement format least society months log
safety friends sure faq trade edition cars messages marketing tell
further updated association able having provides david fun already
green studies close common drive specific several gold feb living
collection called short arts lot ask display limited powered solutions
means director daily beach past natural whether due et electronics five
upon period planning database says official weather mar land average
done technical window france pro region island record direct microsoft
conference environment records st district calendar costs style url
front statement update parts aug ever downloads early miles sound
resource present applications either ago document word works material
bill apr written talk federal hosting rules final adult tickets thing
centre requirements via cheap nude kids finance true minutes else mark
third rock gifts europe reading topics bad individual tips plus auto
cover usually edit together videos percent fast function fact unit
getting global tech meet far economic en player projects lyrics often
subscribe submit germany amount watch included feel though bank risk
thanks everything deals various words linux jul production commercial
james weight town heart advertising received choose treatment newsletter
archives points knowledge magazine error camera jun girl currently
construction toys registered clear golf receive domain methods chapter
makes protection policies loan wide beauty manager india position taken
sort listings models michael known half cases step engineering florida
simple quick none wireless license paul friday lake whole annual
published later basic sony shows corporate church method purchase
customers active response practice hardware figure materials fire
holiday chat enough designed along among death writing speed html
countries loss face brand discount higher effects created remember
standards oil bit yellow political increase advertise kingdom base near
environmental thought stuff french storage japan doing loans shoes
entry stay nature orders availability africa summary turn mean growth
notes agency king monday european activity copy although drug pics
western income force cash employment overall bay river commission ad
package contents seen players engine port album regional stop
supplies started administration bar institute views plans double dog
build screen exchange types soon sponsored lines electronic continue
across benefits needed season apply someone held ny anything printer
condition effective believe organization effect asked eur mind sunday
selection casino pdf lost tour menu volume cross anyone mortgage hope
silver corporation wish inside solution mature role rather weeks
addition supported score appear itself variety gas prior author
stemming important concept computer science interesting walk walked
walking walks like liked likes liking use used uses using
i like computer science it is interesting
"""

DEMO_FREQ: dict[str, int] = {}
for _rank, _w in enumerate(dict.fromkeys(_DEMO_WORDS.split())):
    DEMO_FREQ.setdefault(_w, max(1, 100_000 - _rank * 10))
DEMO_TOTAL = sum(DEMO_FREQ.values())


def load_frequency_dict(path: str) -> dict[str, int]:
    """Load a frequency dictionary file: one ``word[<TAB|space>count]``
    per line (count defaults to 1) — the shape of public word-frequency
    lists (e.g. Norvig's count_1w.txt)."""
    out: dict[str, int] = {}
    # utf-8-sig: the reference's vendored dictionary starts with a BOM
    # which must not become part of the first word ("﻿the")
    with open(path, encoding="utf-8-sig") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            out[parts[0].lower()] = int(parts[1]) if len(parts) > 1 else 1
    return out


def word_break(text: str, freq: dict[str, int], total: int | None = None) -> list[str]:
    """Single-string DP: the segmentation of ``lower(text)`` into dict
    words maximizing Σ log p(word); raises ValueError if no full
    segmentation exists (WBT:139-141). Stop words are removed AFTER
    segmentation (WBT:152-154)."""
    s = text.lower().strip()
    if not s:
        return []
    total = total or sum(freq.values()) or 1
    maxlen = max(map(len, freq)) if freq else 0
    n = len(s)
    NEG = float("-inf")
    best = [NEG] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    logp = {w: math.log(c / total) for w, c in freq.items()}
    for i in range(1, n + 1):
        for j in range(max(0, i - maxlen), i):
            if best[j] == NEG:
                continue
            w = s[j:i]
            lp = logp.get(w)
            if lp is None:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = (j, w)
    if best[n] == NEG:
        raise ValueError(f"text is not breakable with this dictionary: {text!r}")
    words: list[str] = []
    i = n
    while i > 0:
        j, w = back[i]  # type: ignore[misc]
        words.append(w)
        i = j
    words.reverse()
    return [w for w in words if w not in STOP_WORDS]


def word_break_udf(freq: dict[str, int] | None = None):
    """Arrow pandas UDF ``text -> array<string>`` running the DP per
    row with the dictionary shipped once via the closure."""
    freq = freq or DEMO_FREQ
    total = sum(freq.values())

    @F.pandas_udf(ArrayType(StringType()))
    def _wb(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: word_break(t or "", freq, total))

    return _wb
