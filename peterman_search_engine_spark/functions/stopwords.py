"""The reference engine's fixed 127-word English stop list.

Word list data carried over for behavioral parity with
``analysis/StopWords.java:13-143`` in the reference ("Please use this
list and don't change it for uniform behavior in testing"). This is
the classic NLTK English stop list.
"""

STOP_WORDS: frozenset[str] = frozenset(
    """
    i me my myself we our ours ourselves you your yours yourself
    yourselves he him his himself she her hers herself it its itself
    they them their theirs themselves what which who whom this that
    these those am is are was were be been being have has had having
    do does did doing a an the and but if or because as until while
    of at by for with about against between into through during
    before after above below to from up down in out on off over
    under again further then once here there when where why how all
    any both each few more most other some such no nor not only own
    same so than too very s t can will just don should now
    """.split()
)

assert len(STOP_WORDS) == 127
