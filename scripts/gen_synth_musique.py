#!/usr/bin/env python
"""Generate a synthetic MuSiQue-style dataset (the real dev set is not in
this image; BASELINE.md configs 1/4 are exercised with this stand-in).

Items follow the MuSiQue contract {id, question, answer, answer_aliases,
answerable, paragraphs: [{idx, title, paragraph_text, is_supporting}]}.

v2 (round 3): the v1 set saturated at EM 1.00, so this generator adds the
headroom the judge asked for (VERDICT r2 "de-saturate the eval"):
  * 8 question kinds per cycle — the 5 v1 kinds plus a TRUE 4-hop chain
    (work -> label -> founder -> spouse -> city), a 3-hop chain whose
    relations (label-of / founded-by) sit OUTSIDE the answer layer's cue
    lexicon, and an UNANSWERABLE kind (asks about an off-corpus work;
    gold `answerable: false`, scored via predicted_answerable);
  * answer aliases / surface variants: city paragraphs sometimes write
    "Denver, Colorado" (gold answer stays "Denver" with the long form as
    an alias), year paragraphs sometimes write "the year 1983";
  * confusable distractor worlds: every item carries two distractor
    worlds whose work titles share the same suffix word (e.g. "Bami
    Horizon" vs "Bafen Horizon") plus regular distractors (default 12,
    was 8).

v3 (late round 3): the round-3 answer-path work closed the v2 kinds
(EM 0.709 -> 0.994), so the cycle widens to 10 with two kinds the
machinery of that moment could not solve (both closed later in round 3
by answer/comparative.py and the agentive 'artist behind' cue family;
work titles are now collision-free across worlds — a duplicate title
made the performer hop ambiguous and ghost-work collisions could make
an unanswerable item answerable):
  * kind 8, comparative: "Which was released first, A or B?" — needs
    cross-paragraph year comparison, not a relation chain; the answer is
    one of two work titles named in the question (so bridge/entity
    exclusion must not veto it);
  * kind 9, paraphrase: "Which city is the birthplace of the artist
    behind W?" — the performer hop is worded outside every cue lexicon
    ('artist behind');
  * person/spouse paragraphs sometimes open follow-up sentences with
    pronouns ("She was born in ..."), exercising subject coref on the
    production path.

v4 (late round 3): the v3 kinds closed too (EM 1.00), so the cycle widens
to 14 with four kinds that need EXACT MATH OVER SETS of resolved facts —
arithmetic and aggregation, not chains or pairwise comparison:
  * kind 10, temporal difference: "How many years after the release of A
    was B released?" — the answer is a COMPUTED number that appears in no
    paragraph (span extraction cannot find it);
  * kind 11, label-set superlative: "Which album on the label L was
    released first?" — requires enumerating ALL works released on L
    (reverse edge traversal) and taking the year argmin; the label carries
    three works (two generated siblings);
  * kind 12, yes/no: "Was A released before B?" — the answer is a
    polarity, not an entity or span;
  * kind 13, count: "How many albums were released on the label L?" —
    set cardinality over the reverse label edges.
Labels are collision-free across worlds (a shared label would corrupt
founder chains and make superlative/count golds wrong).

v5 (late round 3): the v4 kinds closed (EM 1.00), so the pressure moves
from the QUESTION side to the EVIDENCE side: every supporting fact is
now written through a paraphrase bank — release sentences say "came
out in" / "was put out in ... by the label", performer sentences say
"a record by" / "P recorded the album W", spouses "wed" / "X's spouse
is", births "is a native of" / "hails from", foundings "was started
by". The questions are unchanged; what breaks is rule-note extraction
(the relation lexicons and the active-voice inversion set), which is
exactly what varies in real text.

v6 (late round 3): the v5 surfaces closed (EM 1.00), so the evidence gets
the texture of real Wikipedia prose rather than just verb paraphrases:
  * FILLER sentences inside supporting paragraphs (cue-free color like
    "Critics gave the album favorable reviews.") — support labels stay
    paragraph-level, but note extraction, packing, and span picking must
    not be diluted or distracted;
  * SURNAME-ONLY coref: follow-up sentences open with the person's bare
    surname ("Lane was born in Boston.") — keys must resolve to the full
    name introduced earlier or the graph hop breaks;
  * APPOSITIVE multi-relation sentences: "{W}, an album by {P}, was
    released in {Y} on the label {L}." — three relations in ONE sentence,
    with the performer cue inside a comma appositive;
  * FULL DATE surfaces: "released on 4 March 1967" — the year must be
    lifted out of a day-month-year string for kind-3 answers and all the
    v4 temporal math.

v7 (late round 3): the v6 texture closed (EM 1.00), so the evidence turns
adversarial — three traps real corpora set constantly:
  * NEGATION: ~35% of work paragraphs append "It was not released on
    {FOIL}." / "Early pressings wrongly credited the label {FOIL}.",
    where FOIL is a confusable world's REAL label (with its own founder
    chain) — extraction that ignores "not"/"wrongly" forges a label edge
    and the founder-chain kinds follow it to the wrong answer;
  * ABBREVIATIONS: ~35% of label paragraphs introduce the label as
    "{L} ({ABBR})" and state the founding fact under the bare ABBR
    ("{ABBR} was started by {F}.") — the founded_by edge must resolve
    the parenthetical alias back to the full label name or the chain
    breaks at hop 2;
  * RELATIVE DATES: one label-set sibling states its release only as an
    offset ("released on the label L two years after W") — superlative /
    count / temporal questions over the label set need year arithmetic
    through the anchor work's absolute year.

v8 (late round 3): the v7 traps closed (EM 1.00), so the cycle widens to
18 with four kinds that compose sets, ordinals, and a second alias class:
  * kind 14, label intersection: "Which record label released both A and
    B?" — the answer is the LABEL, reached by intersecting two works'
    released-on edges (reverse of every chain so far: the label is the
    answer, not a hop);
  * kind 15, ordinal: "What was the second album released on the label
    L?" — sort the label's work set by year and take index 1 (the v4
    superlative machinery does argmin/argmax only), with the v7
    relative-offset sibling still in the mix;
  * kind 16, stage name: the person paragraph opens "{P}, known
    professionally as {S}, ..." and the work credits only S — the
    performer hop must resolve a NON-initial alias (the v7 abbreviation
    pass keys on initials);
  * kind 17, re-release trap: the work paragraph appends "It was
    reissued in {Y2} by {FOIL}." where FOIL is a live confusable label —
    "Who founded the label that originally released W?" must follow the
    ORIGINAL label edge, not the reissue (temporal qualifier on a
    relation, the dual of v7's polarity guard).

v9 (late round 3): the v8 kinds closed (EM 1.00), so the cycle widens to
22 with four kinds that COMPOSE the solved machinery — constraint
intersection, range membership, in-question option resolution, and
cross-chain equality:
  * kind 18, conjunctive constraint: "Which album by P was released on
    the label L?" — BOTH constraints must bind: the corpus carries
    another album by P on a different label AND another album on L by a
    different performer, so single-constraint matching picks a foil;
  * kind 19, decade membership: "Which album on the label L was released
    in the 1970s?" — year-range bucketing over the label set (the other
    works sit in different decades);
  * kind 20, bridged comparative: "Which was released first, A or the
    album performed by P2?" — one comparative option is a DESCRIPTION
    that must be resolved through a hop before the year math;
  * kind 21, cross-chain equality: "Were the performer of A and the
    performer of B born in the same city?" — two 2-hop chains resolved
    independently, then compared for identity (yes/no).

v10 (late round 3): the v9 kinds closed (EM 1.00), so the cycle widens
to 26 with four kinds that GENERALIZE the set machinery along new axes —
whose-set, filtered aggregation, nested anchors, and question-side
negation:
  * kind 22, performer-set superlative: "Which album by P was released
    first?" — the set anchor is a PERFORMER (reverse performed_by), not
    a label; P has three albums on three different labels;
  * kind 23, filtered count: "How many albums on the label L were
    released in the 1990s?" — cardinality AFTER a decade filter (the
    label carries works in and out of the decade);
  * kind 24, nested anchor: "How many years after the release of the
    first album on the label L was W released?" — the temporal-diff
    option is itself a superlative that must resolve first;
  * kind 25, negated conjunctive: "Which album by P was not released on
    the label L?" — set difference where v9's kind 18 intersects (and a
    foil album on L by another performer rides along).

v11 (late round 3): the v10 kinds closed (EM 1.00), so the cycle widens
to 30 with four kinds whose machinery is still missing outright:
  * kind 26, inverse-hop anchor: "Who is the spouse of the founder of
    the label that released the album performed by P?" — the chain
    STARTS at a performer, whose first hop runs AGAINST the stored edge
    direction (work --performed_by--> P), then forward for 3 more hops;
  * kind 27, unordered temporal distance: "How many years apart were A
    and B released?" — absolute difference, no before/after direction;
  * kind 28, count comparative: "Which label released more albums, L1
    or L2?" — compare two set CARDINALITIES, answer is a label;
  * kind 29, computed-distance superlative: "Which album on the label L
    was released closest to W?" — argmin of |year - anchor_year| with
    the anchor itself excluded from the set.

v12 (late round 3): the v11 kinds closed (EM/supEM 1.00), so the cycle
widens to 34 with four kinds whose machinery is again missing outright:
  * kind 30, time-scoped relation: the person paragraph carries a
    MARRIAGE HISTORY ("P married X1 in 1981. P and X1 divorced in 1993.
    P married X2 in 1996.") and the question asks "Who was the spouse of
    P at the time W was released?" — the right fact depends on a
    temporal join against W's release year;
  * kind 31, non-year numeric attribute: "Which album has more tracks,
    A or B?" — track counts are written as NUMBER WORDS ("It features
    ten tracks."), so the comparison needs word-number parsing of an
    attribute no triple carries;
  * kind 32, answer-type coercion: "In which state was the performer of
    W born?" — the birth fact names a CITY; the city-to-state
    containment lives in a separate geography paragraph, an extra hop
    the question never names;
  * kind 33, entity-present unanswerable: "Who produced W?" where W's
    paragraphs EXIST but state no producer — the answerable gate must
    decline even though retrieval finds the entity (unlike kind 7's
    ghost works).

v13 (late round 3): the v12 kinds closed (EM/ansAcc 1.00), so the cycle
widens to 38 with four kinds that COMPOSE the newest machinery:
  * kind 34, descriptive person in a temporal join: "Who was the spouse
    of the performer of W2 at the time W was released?" — the person in
    the marriage-history join must itself resolve through a hop;
  * kind 35, same-STATE equality: "Were the performer of A and the
    performer of B born in the same state?" — the city pool now has
    SHARED-STATE pairs (Boston/Cambridge, Austin/Houston, ...), so
    comparing city surfaces is wrong; both cities must coerce through
    their geography paragraphs;
  * kind 36, successor resolution: "Which album on the label L was
    released immediately after W?" — the minimum year strictly greater
    than the anchor's, not an extremum or a distance;
  * kind 37, conjunctive count: "How many albums by P were released on
    the label L?" — cardinality of an intersection (P also has works on
    other labels, L also has works by other performers).

v14 (round 3, session 4): the v13 kinds closed (EM 1.00), so the cycle
widens to 42 with four kinds that compose the solved set/arithmetic
machinery along axes none of the existing stages cover:
  * kind 38, hop-after-superlative: "Who performed the first album
    released on the label L?" — the superlative resolves to a WORK,
    then the performer hop must run on the RESOLVED work (every solved
    superlative ends at the work title);
  * kind 39, numeric difference: "How many more tracks does A have than
    B?" — word-number parsing of both track counts plus a SUBTRACTION;
    the answer is a computed number in no paragraph (kind 31 only
    compares);
  * kind 40, range arithmetic: "How many years apart were the first and
    the last albums released on the label L?" — TWO superlatives over
    the label set, then their difference (kind 27's years-apart takes
    two named works; here both ends must be resolved from the set);
  * kind 41, universal quantification: "Were all of the albums on the
    label L released in the 1990s?" — forall over the label set with a
    yes/no answer (kind 19 finds the one member IN the decade; the
    'no' case hides a single counterexample).

v15 (round 3, session 4): the v14 kinds closed (EM 1.00), so the cycle
widens to 46 with four kinds whose machinery is again missing:
  * kind 42, member-by-year + hop: "Who performed the album released on
    the label L in 1994?" — select the set member by YEAR EQUALITY (not
    an extremum), then hop performed_by on the selected work;
  * kind 43, attribute superlative: "Which album on the label L has the
    most tracks?" — argmax over a word-number attribute carried by
    EVERY member paragraph (the attr stages so far are pairwise);
  * kind 44, existential quantification: "Did any album on the label L
    come out in the 1980s?" — exists() over the set with a yes/no
    answer (the forall stage's dual; 'no' means NO member qualifies);
  * kind 45, same-label equality: "Were A and B released on the same
    label?" — the same-attribute comparison runs on WORKS via their
    released_on_label edges (the city/state stage keys persons).

v16 (round 3, session 4 — OPEN round-4 headroom): the v15 kinds closed
(all 1.00), so the cycle widens to 50 with four kinds left UNSOLVED at
round-3 end (the recorded floor is the round-4 target):
  * kind 46, two-hop after superlative: "Where was the performer of the
    last album released on the label L born?" — superlative ->
    performed_by -> born_in (the hop stages take exactly one hop);
  * kind 47, label of the performer-set superlative: "Which label
    released the first album by P?" — the set anchors on a PERFORMER,
    the answer is the resolved member's LABEL (reverse of kind 38);
  * kind 48, attribute sum: "How many tracks do the albums on the label
    L have in total?" — SUM of word-number counts over the whole set
    (the attr stages do argmax/diff, never aggregation);
  * kind 49, superlative-anchored temporal join: "Who was the spouse of
    the performer of W at the time the first album on the label L was
    released?" — the marriage-history join's time anchor is itself a
    superlative that must resolve first.

v17 (round 3, session 4; CLOSED session 5 at EM/supEM/supF1/ansAcc all
1.00 over 216 items — floor was EM 0.833/supEM 0.75 on the four kinds):
the v16 kinds closed (all 1.00), so the cycle widened to 54:
  * kind 50, three-step member join: "Where was the performer of the
    album released on the label L in 1994 born?" — year-equality member
    selection -> performed_by -> born_in;
  * kind 51, interval membership: "Which album on the label L was
    released between 1980 and 1990?" — a two-sided year window (the
    decade stage only buckets canonical decades);
  * kind 52, attribute-threshold count: "How many albums on the label L
    have more than ten tracks?" — cardinality AFTER a word-number
    attribute filter;
  * kind 53, inverse hop at chain END: "Which album was performed by
    the spouse of P?" — resolve spouse(P) forward, then the LAST hop
    runs AGAINST the stored edge (work --performed_by--> spouse).

v18 (round 3, session 5; CLOSED same session at EM/supEM/supF1/ansAcc
all 1.00 over 232 items — floor was EM 0.4375 on the four new kinds):
the v17 kinds closed (all 1.00), so the cycle widens to 58 with four
kinds composing solved machinery along new axes:
  * kind 54, hop-resolved comparative: "Which was released first, the
    album performed by A or the album performed by B?" — the compared
    operands are DESCRIPTIVE and must resolve through reverse performer
    edges before the year comparison (every solved comparative names
    its options);
  * kind 55, attribute-threshold selection: "Which album on the label L
    has more than ten tracks?" — kind 52's filter reused as a WHICH
    (unique member above the cut), not a count;
  * kind 56, chain-end attribute lookup: "How many tracks does the
    album performed by the spouse of P have?" — the kind-53 inverse hop
    composed with a word-number attribute read on the hopped-to work;
  * kind 57, dual-label membership: "Which album was released both on
    the label L1 and on the label L2?" — the work carries a PRIMARY
    label edge and a genuine reissue edge; the kind-17 trap taught the
    pipeline to distrust reissues, here the reissue is load-bearing.

v19 (round 3, session 5 — OPEN round-4 headroom): the v18 kinds closed
(all 1.00), so the cycle widens to 62 with four kinds left UNSOLVED
(the recorded floor is the round-4 target):
  * kind 58, hop-resolved conjunctive: "Which album by the spouse of P
    was released on the label L?" — the performer operand of the
    kind-18 conjunction resolves through spouse_of; single-constraint
    foils on both sides;
  * kind 59, superlative member + attribute read: "How many tracks
    does the first album released on the label L have?" — attr lookup
    on the argmin of the release years;
  * kind 60, non-strict threshold count: "How many albums on the label
    L have at least/at most N tracks?" — a member always sits exactly
    ON the cut, so the strict reading is wrong by one;
  * kind 61, universal quantification over an attribute: "Do all
    albums on the label L have more than N tracks?" — the forall
    machinery exists only for decades; "no" plants the counterexample
    on the asked work itself.

v20 (round 3, session 5; closed same session): kinds 62-65 — superlative
span, negated decade selection, spouse-of-performer-of-superlative,
decade-filtered attribute sum (floor EM 0.375, closed at 1.00).

v21 (round 3, session 5; closed session 6): kinds 66-69 — cross-label
superlative attr comparison, count over a hop-resolved set anchor,
temporal read on the attribute argmax, existential over attribute +
decade (floor EM 0.0, closed at EM/supF1 1.00).

v22 (round 3, session 6; closed same session at EM/supF1 1.00): the v21
kinds closed, so the cycle widens to 74:
  * kind 70, superlative hop on an UNNAMED label: "Who performed the
    last album released on the label that released W?" — the set
    anchor resolves through a member's forward edge (kind 67) BEFORE
    the superlative + performer hop run;
  * kind 71, decade-bucket count comparison: "Were more albums on the
    label L released in the 1980s than in the 1990s?" — two
    decade-filtered counts over one label compared as yes/no, with a
    third-decade noise member;
  * kind 72, cross-label TOTAL attribute comparison: "Which label's
    albums have more tracks in total, L1 or L2?" — attr_sum per label
    feeding the comparator (kind 66 compares one member per label);
  * kind 73, attribute-equality count join: "How many albums on the
    label L have the same number of tracks as W?" — the threshold is
    another member's attribute, not a literal; the naive reading
    counts w itself (off by one).

v23 (round 3, session 6; closed same session at EM/supF1 1.00): the
v22 kinds closed, so the cycle widens to 78:
  * kind 74, member selection through a 2-hop performer-attribute
    join: "Which album on the label L was performed by someone born in
    C?" — the filter fact (the performer's birth city) lives in a
    SEPARATE paragraph per member; solved member filters read the
    member's own sentence;
  * kind 75, difference of two superlative-resolved attribute reads:
    "How many more tracks does the first album on L1 have than the
    first album on L2?" — attr_difference takes named options;
  * kind 76, negated decade count: "How many albums on the label L
    were not released in the D0s?" — the complement of the decade
    filter over the full membership;
  * kind 77, decade-filtered attribute superlative: "Which album on
    the label L released in the 1980s has the most tracks?" — the
    out-of-decade trap member carries the GLOBAL max count.

v24 (round 3, session 6; closed same session at EM/supF1 1.00): the
v23 kinds closed, so the cycle widens to 82:
  * kind 78, attribute ORDINAL: "Which album on the label L has the
    second most tracks?" — the solved ordinal ranks release years and
    the attr superlative takes only the extremum;
  * kind 79, decade MODE: "In which decade were the most albums on the
    label L released?" — argmax over decade buckets answered as a
    decade surface;
  * kind 80, yes/no attribute comparison of two superlative operands:
    "Does the first album on L have more tracks than the last album on
    L?" — both operands resolve before the count comparison;
  * kind 81, combined count across two labels: "How many albums were
    released on the labels L1 and L2 combined?" — the counted set is a
    UNION of two memberships.

v25 (round 3, session 8): the v24 kinds closed, so the cycle widens
to 86:
  * kind 82, attribute AVERAGE: "What is the average number of tracks
    across the albums on the label L?" — a new arithmetic op (mean);
    every solved aggregate is a sum, difference, count, or extremum;
  * kind 83, MULTI-ANSWER enumeration: "Which albums on the label L
    were released in the D0s?" — the gold is a SET of two titles
    ("A and B"); every solved kind answers with a single
    span/number/polarity;
  * kind 84, negative existence: "Did P release an album on the label
    L2?" — the polarity comes from the ABSENCE of an edge (50% yes
    items keep constant-answer strategies at 0.5);
  * kind 85, hop-resolved threshold count: "How many albums on the
    label L were released after W?" — the threshold year must be read
    off the anchor member, not the question.

v26 (round 3, session 8; left OPEN for round 4): the cycle widens
to 90:
  * kind 86, reverse ordinal: "the second most recent album on L" —
    rank DESCENDING by year;
  * kind 87, performer intersection: "Which performer released albums
    on both the labels L1 and L2?" — the answer is the PERSON spanning
    both rosters (solved intersection goes works -> label);
  * kind 88, anchor-relative window count: "released within N years of
    W" — a two-sided hop-resolved interval;
  * kind 89, option-resolved 2-hop selection: "Whose spouse was born
    in C: P1 or P2?" — each option resolves spouse_of -> born_in
    before the filter picks one.

v27 (round 3, session 8): the v26 kinds closed same session
(performer_intersection, count_within_anchor, option_spouse_born
stages; reverse ordinal fell to the existing descending rank), so the
cycle widens to 94:
  * kind 90, two-anchor interval count: "released between W1 and W2"
    — BOTH bounds hop-resolved, exclusive of the anchors;
  * kind 91, 4-step chain on the resolved extremum: "In which city was
    the spouse of the performer of the most recent album on L born?";
  * kind 92, distinct count over a hop-resolved attribute: "In how
    many different cities were the performers of the albums on L
    born?" — the tally deduplicates resolved cities;
  * kind 93, same-year selection: the filter year is hop-resolved and
    the equality needs the tied pair every solved stage refuses.

Usage: gen_synth_musique.py out.jsonl [--n 200] [--distractors 12] [--seed 0]
"""
from __future__ import annotations

import argparse
import json

import numpy as np

_SYL = ["ba", "den", "cor", "mi", "ra", "vel", "to", "lin", "sha", "gor",
        "ne", "ti", "lu", "mar", "kes", "on", "za", "pri", "hol", "fen"]
_WORK_W = ["Horizon", "River", "Steps", "Origins", "Echo", "Garden",
           "Signal", "Harbor", "Summit", "Mosaic"]
_CITIES = ["Boston", "Chicago", "Denver", "Austin", "Seattle", "Portland",
           "Atlanta", "Nashville", "Tucson", "Madison"]
_STATES = {"Boston": "Massachusetts", "Chicago": "Illinois",
           "Denver": "Colorado", "Austin": "Texas", "Seattle": "Washington",
           "Portland": "Oregon", "Atlanta": "Georgia",
           "Nashville": "Tennessee", "Tucson": "Arizona",
           "Madison": "Wisconsin",
           # v13 shared-state partners: same-STATE questions must not be
           # answerable by comparing city surfaces
           "Cambridge": "Massachusetts", "Houston": "Texas",
           "Springfield": "Illinois", "Salem": "Oregon",
           "Knoxville": "Tennessee"}
# city -> its same-state partner (both directions)
_STATE_PARTNER = {"Boston": "Cambridge", "Cambridge": "Boston",
                  "Austin": "Houston", "Houston": "Austin",
                  "Chicago": "Springfield", "Springfield": "Chicago",
                  "Portland": "Salem", "Salem": "Portland",
                  "Nashville": "Knoxville", "Knoxville": "Nashville"}
_LABEL_W = ["Records", "Sound", "Audio", "Disc", "Music"]


def _name(rng) -> str:
    def word():
        return "".join(rng.choice(_SYL, rng.integers(2, 4))).capitalize()
    return f"{word()} {word()}"


def _world(rng, work_suffix=None, work_first=None, syl=2):
    """One item's facts: performer, work, spouse, label chain, cities.

    syl: first-word syllable count for the work and label names. The
    2-syllable space holds 400 first words (2000 labels); large n
    exhausts it and the fresh-name rejection loops spin — callers
    escalate to syl=3 under collision pressure (capacity x20)."""
    first = work_first or "".join(rng.choice(_SYL, syl)).capitalize()
    suffix = work_suffix or str(rng.choice(_WORK_W))
    return {
        "person": _name(rng),
        "work": f"{first} {suffix}",
        "spouse": _name(rng),
        "city": str(rng.choice(_CITIES)),
        "spouse_city": str(rng.choice(_CITIES)),
        "year": int(rng.integers(1950, 2020)),
        # v6: ~40% of releases carry a day-month date the year must be
        # lifted from; fixed per world so question aliases can cite it
        "date": str(rng.choice(_DATES)) if rng.random() < 0.4 else None,
        "label": f"{''.join(rng.choice(_SYL, syl)).capitalize()} "
                 f"{rng.choice(_LABEL_W)}",
        "founder": _name(rng),
        "founder_spouse": _name(rng),
        "founder_spouse_city": str(rng.choice(_CITIES)),
    }


def _city_surface(city: str, rng) -> str:
    """Sometimes the long 'City, State' surface — the gold stays short with
    the long form as an alias, so span extraction must normalize."""
    return f"{city}, {_STATES[city]}" if rng.random() < 0.4 else city


# v5 paraphrase banks: index 0 = the v4 surface; the rest vary the verb
# outside the original extraction lexicons. {X}=subject {Y}=object.
_PERFORM_T = [
    "{W} is an album performed by {P}.",
    "{W} is an album by {P}.",
    "{W} is a record by {P}.",
    "{P} recorded the album {W}.",
]
_RELEASE_T = [
    "It was released in {Y} on the label {L}.",
    "It came out in {Y} on the label {L}.",
    "It was put out in {Y} by the label {L}.",
]
_SPOUSE_T = [
    "{X} married {Y}.",
    "{X} wed {Y}.",
    "{X}'s spouse is {Y}.",
]
_BORN_T = [
    "{X} was born in {C}.",
    "{X} is a native of {C}.",
    "{X} hails from {C}.",
]
_FOUNDED_T = [
    "{L} was founded by {F}.",
    "{L} was started by {F}.",
    "{F} established {L}.",
]


def _pick(rng, bank):
    return bank[int(rng.integers(0, len(bank)))]


# ---------------------------------------------------------------- v6 texture
# appositive one-sentence multi-relation surface for the work paragraph:
# performer rides a comma appositive, release + label sit in the main
# clause; {R} is the release clause ("in 1983" / "on 4 March 1983")
_WORK_APPOS_T = [
    "{W}, an album by {P}, was released {R} on the label {L}.",
    "{W}, a record by {P}, came out {R} on the label {L}.",
]
# day-month release surfaces (the year must be lifted from the date string)
_DATES = ["4 March", "17 June", "1 September", "23 November", "9 January"]
_RELEASE_DATE_T = [
    "It was released on {D} {Y} on the label {L}.",
    "It came out on {D} {Y} through the label {L}.",
]
# cue-free filler: no relation lexicon word, no capitalized non-entity spans
_FILLER_WORK = [
    "Critics gave the album favorable reviews.",
    "It features ten tracks.",
    "The album took several months to complete.",
]
_FILLER_PERSON = [
    "{S} toured extensively during the decade.",
    "{S} has received several awards.",
]
_FILLER_LABEL = [
    "The label signed dozens of acts over the years.",
    "Its catalog spans several genres.",
]

# v7 negation traps: FOIL is a confusable world's real label — extraction
# that ignores the polarity forges a released_on_label edge into a live
# founder chain
_NEG_T = [
    "It was not released on {FOIL}.",
    "Early pressings wrongly credited the label {FOIL}.",
]


def _abbr(label: str) -> str:
    return "".join(w[0] for w in label.split() if w[:1].isupper())


def _surname(full: str) -> str:
    return full.split()[-1]


def _release_sent(w, year_surface, rng):
    if w.get("date"):
        return _pick(rng, _RELEASE_DATE_T).format(
            D=w["date"], Y=year_surface, L=w["label"])
    return _pick(rng, _RELEASE_T).format(Y=year_surface, L=w["label"])


def _coref_subject(rng, full: str, pronoun: str) -> str:
    """v6 follow-up subject: full name / pronoun / bare surname."""
    r = rng.random()
    if r < 0.25:
        return pronoun
    if r < 0.55:
        return _surname(full)
    return full


# v8 re-release trap: a second, LATER release edge into a live confusable
# label — original-release questions must not follow it
_REISSUE_T = [
    "It was reissued in {Y2} by {FOIL}.",
    "A remastered edition was issued by {FOIL} in {Y2}.",
]


def _paragraphs(w, rng, foil_label=None, abbr_ok=False, stage_name=None):
    # a day-dated release never uses the "the year Y" surface
    year_surface = (f"the year {w['year']}"
                    if rng.random() < 0.3 and not w.get("date")
                    else str(w["year"]))
    p_sub = _coref_subject(rng, w["person"], "She")
    s_sub = _coref_subject(rng, w["spouse"], "He")
    # v8 stage name: the work credits ONLY the stage surface; the person
    # paragraph introduces the alias ("P, known professionally as S, ...")
    credit = stage_name or w["person"]
    if rng.random() < 0.35:
        # v6 appositive: perform + release + label in ONE sentence
        rel = (f"on {w['date']} {year_surface}" if w.get("date")
               else f"in {year_surface}")
        work_text = _pick(rng, _WORK_APPOS_T).format(
            W=w["work"], P=credit, R=rel, L=w["label"])
    else:
        perform = _pick(rng, _PERFORM_T).format(W=w["work"], P=credit)
        work_text = f"{perform} {_release_sent(w, year_surface, rng)}"
    if rng.random() < 0.5:
        work_text += f" {_pick(rng, _FILLER_WORK)}"
    if foil_label is not None and rng.random() < 0.35:
        work_text += f" {_pick(rng, _NEG_T).format(FOIL=foil_label)}"
    p_intro = (f"{w['person']}, known professionally as {stage_name}, "
               f"is a musician. " if stage_name else "")
    p_spouse = _pick(rng, _SPOUSE_T).format(X=w["person"], Y=w["spouse"])
    p_born = _pick(rng, _BORN_T).format(
        X=p_sub, C=_city_surface(w["city"], rng))
    p_fill = (f" {_pick(rng, _FILLER_PERSON).format(S=_surname(w['person']))}"
              if rng.random() < 0.4 else "")
    s_born = _pick(rng, _BORN_T).format(
        X=s_sub, C=_city_surface(w["spouse_city"], rng))
    # v7: the label is sometimes introduced with a parenthetical
    # abbreviation, and BOTH founding facts are then stated under the bare
    # abbreviation — the chain must resolve the alias to survive hop 2
    label_name = w["label"]
    label_intro = f"{w['label']} is a record label."
    if abbr_ok and rng.random() < 0.35:
        ab = _abbr(w["label"])
        if len(ab) >= 2:
            label_name = ab
            label_intro = f"{w['label']} ({ab}) is a record label."
    founded = _pick(rng, _FOUNDED_T).format(L=label_name, F=w["founder"])
    l_fill = (f" {_pick(rng, _FILLER_LABEL)}"
              if rng.random() < 0.4 else "")
    fs_sub = _coref_subject(rng, w["founder_spouse"], "She")
    fs_born = _pick(rng, _BORN_T).format(
        X=fs_sub, C=_city_surface(w["founder_spouse_city"], rng))
    return [
        (f"{w['work']} (album)", work_text),
        (w["person"],
         f"{p_intro}{p_spouse} The spouse of {w['person']} is {w['spouse']}. "
         f"{p_born}{p_fill}"),
        (w["spouse"],
         f"{w['spouse']} is married to {w['person']}. {s_born}"),
        (w["label"],
         f"{label_intro} {founded}{l_fill}"),
        (w["founder"],
         f"{w['founder']} founded {label_name}. The spouse of "
         f"{w['founder']} is {w['founder_spouse']}."),
        (w["founder_spouse"],
         f"{w['founder_spouse']} is married to {w['founder']}. {fs_born}"),
    ]


_CITY_KEYS = {"city", "spouse_city", "founder_spouse_city"}


def _aliases(w, key) -> list:
    if key in _CITY_KEYS:
        city = w[key]
        return [f"{city}, {_STATES[city]}"]
    return []


def _unique_worlds(rng, count, seen, **kw):
    """Worlds whose work titles AND label names are unseen so far: a title
    collision puts two contradictory '<W> (album)' paragraphs in one item
    (the performer hop becomes ambiguous), a ghost work colliding with a
    real one makes an 'unanswerable' item answerable, and a label collision
    corrupts founder chains (kinds 5/6) and the v4 label-set golds
    (kinds 11/13: superlative argmin and count assume L's works are
    exactly the generated ones)."""
    out = []
    tries = 0
    while len(out) < count:
        tries += 1
        w = _world(rng, syl=2 if tries <= 200 else 3, **kw)
        if w["work"] not in seen and w["label"] not in seen:
            seen.add(w["work"])
            seen.add(w["label"])
            out.append(w)
    return out


def _siblings(rng, w, seen, count=2):
    """Sibling works on w's label: own performer/title, years distinct from
    w's and each other (superlative/count golds need a unique argmin)."""
    sibs = []
    years = {w["year"]}
    tries = 0
    while len(sibs) < count:
        tries += 1
        first = "".join(rng.choice(_SYL, 2 if tries <= 200 else 3)
                        ).capitalize()
        suffix = str(rng.choice(_WORK_W))
        title = f"{first} {suffix}"
        year = int(rng.integers(1950, 2020))
        if title in seen or year in years:
            continue
        seen.add(title)
        years.add(year)
        sibs.append({"work": title, "person": _name(rng), "year": year,
                     "date": (str(rng.choice(_DATES))
                              if rng.random() < 0.4 else None)})
    return sibs


def _performer_works(rng, w, seen, count=2):
    """Extra works by w's performer, each on its OWN fresh label, years
    distinct from w's and each other (superlative golds need a unique
    extremum)."""
    out = []
    years = {w["year"]}
    tries = 0
    while len(out) < count:
        tries += 1
        alt = _world(rng, syl=2 if tries <= 200 else 3)
        if (alt["work"] in seen or alt["label"] in seen
                or alt["year"] in years):
            continue
        seen.add(alt["work"])
        seen.add(alt["label"])
        years.add(alt["year"])
        out.append({"work": alt["work"], "label": alt["label"],
                    "year": alt["year"]})
    return out


def _performer_paragraph(x, person):
    return (f"{x['work']} (album)",
            f"{x['work']} is an album by {person}. It was released in "
            f"{x['year']} on the label {x['label']}.")


def _sibling_paragraph(sib, label, rng):
    perform = _pick(rng, _PERFORM_T).format(W=sib["work"], P=sib["person"])
    anchor = sib.get("rel_anchor")
    if anchor is not None:
        # v7 relative date: the absolute year appears NOWHERE for this
        # work — superlative/count math must add the offset to the anchor
        delta = sib["year"] - anchor["year"]
        unit = "year" if abs(delta) == 1 else "years"
        release = (f"It was released on the label {label} {abs(delta)} "
                   f"{unit} {'after' if delta > 0 else 'before'} "
                   f"{anchor['work']}.")
    else:
        release = _release_sent({"date": sib.get("date"), "label": label},
                                str(sib["year"]), rng)
    return (f"{sib['work']} (album)", f"{perform} {release}")


def _spouse_album(rng, seen_works):
    """A fresh (work, label, year) performed by the item's spouse — the
    inverse-hop target for the chain-END kinds (53/56)."""
    tries = 0
    while True:
        tries += 1
        first2 = "".join(rng.choice(_SYL, 2 if tries <= 200 else 3)
                         ).capitalize()
        w2 = f"{first2} {rng.choice(_WORK_W)}"
        if w2 not in seen_works:
            seen_works.add(w2)
            break
    l2 = f"{''.join(rng.choice(_SYL, 2)).capitalize()} " \
         f"{rng.choice(_LABEL_W)}"
    return w2, l2, int(rng.integers(1950, 2020))


def _fresh_work(rng, seen):
    tries = 0
    while True:
        tries += 1
        t = (f"{''.join(rng.choice(_SYL, 2 if tries <= 200 else 3)).capitalize()}"
             f" {rng.choice(_WORK_W)}")
        if t not in seen:
            seen.add(t)
            return t


def _fresh_label(rng, seen):
    tries = 0
    while True:
        tries += 1
        t = (f"{''.join(rng.choice(_SYL, 2 if tries <= 200 else 3)).capitalize()}"
             f" {rng.choice(_LABEL_W)}")
        if t not in seen:
            seen.add(t)
            return t


N_KINDS = 102  # question-kind cycle width

_NUM_WORDS = {2: "two", 3: "three", 4: "four", 5: "five", 6: "six",
              7: "seven", 8: "eight", 9: "nine", 10: "ten", 11: "eleven",
              12: "twelve", 13: "thirteen", 14: "fourteen", 15: "fifteen",
              16: "sixteen", 17: "seventeen", 18: "eighteen",
              19: "nineteen"}


def make_items(n: int, distractors: int, seed: int):
    rng = np.random.default_rng(seed)
    seen_works = set()
    worlds = _unique_worlds(rng, n, seen_works)
    # off-corpus worlds for the unanswerable kind
    ghost_worlds = _unique_worlds(rng, n // 8 + 2, seen_works)
    items = []
    for i, w in enumerate(worlds):
        kind = i % N_KINDS
        answerable = True
        akey = None
        extra_aliases = None
        extra_support_world = None   # (world, para_indices) appended as support
        extra_support_paras = []     # [(title, text)] appended as support
        stage_name = None            # v8 kind 16: work credits this alias
        reissue = False              # v8 kind 17: append a reissue edge
        extra_foil_paras = []        # v9: NON-supporting confounders
        marriage_history = None      # v12 kind 30: replaces person para
        track_counts = None          # v12 kind 31: (own, other) counts
        own_extra_sent = None        # v18 kind 57: appended to own[0]
        # support indexes into _paragraphs(w): 0 work, 1 person, 2 spouse,
        # 3 label, 4 founder, 5 founder_spouse
        if kind == 0:
            q, a, akey = (f"Who is the spouse of the performer of {w['work']}?",
                          w["spouse"], None)
            support = {0, 1}
        elif kind == 1:
            q, a, akey = (f"Where was the performer of {w['work']} born?",
                          w["city"], "city")
            support = {0, 1}
        elif kind == 2:
            q, a = f"Who performed {w['work']}?", w["person"]
            support = {0}
        elif kind == 3:
            q, a = f"When was {w['work']} released?", str(w["year"])
            if w.get("date"):
                # the full date is an acceptable surface for "when"
                extra_aliases = [f"{w['date']} {w['year']}"]
            support = {0}
        elif kind == 4:
            q, a, akey = (f"Where was the spouse of the performer of "
                          f"{w['work']} born?", w["spouse_city"], "spouse_city")
            support = {0, 1, 2}
        elif kind == 5:
            # TRUE 4-hop: work -> label -> founder -> spouse -> city
            q, a, akey = (f"Where was the spouse of the founder of the label "
                          f"that released {w['work']} born?",
                          w["founder_spouse_city"], "founder_spouse_city")
            support = {0, 3, 4, 5}
        elif kind == 6:
            # 3-hop with relations OUTSIDE the cue lexicon (label/founded)
            q, a = (f"Who is the spouse of the founder of the label that "
                    f"released {w['work']}?", w["founder_spouse"])
            support = {0, 3, 4}
        elif kind == 7:
            # unanswerable: asks about a work that exists in no paragraph
            ghost = ghost_worlds[i % len(ghost_worlds)]
            q, a = f"Who is the spouse of the performer of {ghost['work']}?", ""
            support = set()
            answerable = False
        elif kind == 8:
            # comparative: cross-paragraph year comparison; the answer IS a
            # work title named in the question (exclusion gates must not
            # veto it). v3 headroom: no relation chain solves this.
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            first = w if w["year"] < wb["year"] else wb
            q = f"Which was released first, {w['work']} or {wb['work']}?"
            a = first["work"]
            support = {0}
            extra_support_world = (wb, [0])
        elif kind == 9:
            # paraphrase: the performer hop worded outside every cue
            # lexicon ('artist behind'). v3 headroom.
            q, a, akey = (f"Which city is the birthplace of the artist "
                          f"behind {w['work']}?", w["city"], "city")
            support = {0, 1}
        elif kind == 10:
            # temporal difference: the answer is computed, in no paragraph
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            early, late = (w, wb) if w["year"] < wb["year"] else (wb, w)
            diff = late["year"] - early["year"]
            q = (f"How many years after the release of {early['work']} "
                 f"was {late['work']} released?")
            a = str(diff)
            extra_aliases = [f"{diff} years"]
            support = {0}
            extra_support_world = (wb, [0])
        elif kind == 11:
            # label-set superlative: argmin/argmax year over ALL works on L
            sibs = _siblings(rng, w, seen_works)
            if rng.random() < 0.35:
                sibs[0]["rel_anchor"] = {"work": w["work"], "year": w["year"]}
            entries = [{"work": w["work"], "year": w["year"]}] + sibs
            latest = bool(rng.random() < 0.5)
            pick = max(entries, key=lambda e: e["year"]) if latest \
                else min(entries, key=lambda e: e["year"])
            q = (f"Which album on the label {w['label']} was released "
                 f"{'most recently' if latest else 'first'}?")
            a = pick["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 12:
            # yes/no polarity
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            q = f"Was {w['work']} released before {wb['work']}?"
            a = "yes" if w["year"] < wb["year"] else "no"
            support = {0}
            extra_support_world = (wb, [0])
        elif kind == 13:
            # count: cardinality of the label's work set
            sibs = _siblings(rng, w, seen_works)
            if rng.random() < 0.35:
                sibs[0]["rel_anchor"] = {"work": w["work"], "year": w["year"]}
            total = 1 + len(sibs)
            q = f"How many albums were released on the label {w['label']}?"
            a = str(total)
            extra_aliases = [_NUM_WORDS[total]]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 14:
            # v8 label intersection: the LABEL is the answer, reached by
            # intersecting two works' released-on edges
            sibs = _siblings(rng, w, seen_works, count=1)
            q = (f"Which record label released both {w['work']} and "
                 f"{sibs[0]['work']}?")
            a = w["label"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(sibs[0], w["label"],
                                                      rng)]
        elif kind == 15:
            # v8 ordinal: index 1 of the label's works sorted by year
            sibs = _siblings(rng, w, seen_works)
            if rng.random() < 0.35:
                sibs[0]["rel_anchor"] = {"work": w["work"], "year": w["year"]}
            entries = [{"work": w["work"], "year": w["year"]}] + sibs
            pick = sorted(entries, key=lambda e: e["year"])[1]
            q = (f"What was the second album released on the label "
                 f"{w['label']}?")
            a = pick["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 16:
            # v8 stage name: the work credits only the alias
            stage_name = _name(rng)
            q, a = (f"Who is the spouse of the performer of {w['work']}?",
                    w["spouse"])
            support = {0, 1}
        elif kind == 17:
            # v8 re-release trap: follow the ORIGINAL label edge
            reissue = True
            q, a = (f"Who founded the label that originally released "
                    f"{w['work']}?", w["founder"])
            support = {0, 3}
        elif kind == 18:
            # v9 conjunctive constraint: another album by P on a different
            # label AND another album on L by a different performer are
            # both in the corpus — one constraint alone picks a foil
            sib = _siblings(rng, w, seen_works, count=1)[0]
            alt = _unique_worlds(rng, 1, seen_works)[0]
            q, a = (f"Which album by {w['person']} was released on the "
                    f"label {w['label']}?", w["work"])
            support = {0}
            extra_foil_paras = [
                _sibling_paragraph(sib, w["label"], rng),
                (f"{alt['work']} (album)",
                 f"{alt['work']} is an album by {w['person']}. It was "
                 f"released in {alt['year']} on the label {alt['label']}."),
            ]
        elif kind == 19:
            # v9 decade membership: exactly one of the label's works falls
            # in the asked decade
            decade = (w["year"] // 10) * 10
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                while s["year"] // 10 == decade // 10:
                    s["year"] = int(rng.integers(1950, 2020))
            q, a = (f"Which album on the label {w['label']} was released "
                    f"in the {decade}s?", w["work"])
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 20:
            # v9 bridged comparative: one option is a DESCRIPTION resolved
            # through the performer hop before the year comparison
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            first = w if w["year"] < wb["year"] else wb
            q = (f"Which was released first, {w['work']} or the album "
                 f"performed by {wb['person']}?")
            a = first["work"]
            support = {0}
            extra_support_world = (wb, [0])
        elif kind == 21:
            # v9 cross-chain equality: two performer birthplaces compared
            # for identity; steer ~half the items to a same-city pair so
            # a constant yes/no strategy can't score
            want_same = bool(rng.random() < 0.5)
            wb = next((o for o in worlds[i + 1:] + worlds[:i]
                       if o is not w
                       and (o["city"] == w["city"]) == want_same
                       and o["work"] != w["work"]), None)
            if wb is None:
                wb = worlds[(i + 5) % n]
            q = (f"Were the performer of {w['work']} and the performer of "
                 f"{wb['work']} born in the same city?")
            a = "yes" if wb["city"] == w["city"] else "no"
            support = {0, 1}
            extra_support_world = (wb, [0, 1])
        elif kind == 22:
            # v10 performer-set superlative: P has three albums (distinct
            # years, three different labels)
            alts = _performer_works(rng, w, seen_works, count=2)
            entries = [{"work": w["work"], "year": w["year"]}] + alts
            latest = bool(rng.random() < 0.5)
            pick = max(entries, key=lambda e: e["year"]) if latest \
                else min(entries, key=lambda e: e["year"])
            q = (f"Which album by {w['person']} was released "
                 f"{'most recently' if latest else 'first'}?")
            a = pick["work"]
            support = {0}
            extra_support_paras = [_performer_paragraph(x, w["person"])
                                   for x in alts]
        elif kind == 23:
            # v10 filtered count: cardinality AFTER a decade filter
            decade = (w["year"] // 10) * 10
            sibs = _siblings(rng, w, seen_works, count=3)
            in_dec = [y for y in range(decade, decade + 10)
                      if y != w["year"]]
            sibs[0]["year"] = int(rng.choice(in_dec))
            for s in sibs[1:]:
                while s["year"] // 10 == decade // 10:
                    s["year"] = int(rng.integers(1950, 2020))
            q = (f"How many albums on the label {w['label']} were "
                 f"released in the {decade}s?")
            a = "2"
            extra_aliases = [_NUM_WORDS[2]]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 24:
            # v10 nested anchor: the temporal-diff option is itself a
            # superlative over the label set; the argmin is forced to be
            # a SIBLING so the question is a true two-stage resolution
            sibs = _siblings(rng, w, seen_works)
            sibs[0]["year"] = w["year"] - 1 - int(rng.integers(0, 30))
            # ceiling 2022, not 2020: when w.year == 2019 and sibs[0]
            # lands on 2018, [2019, 2020) \ {w.year} is EMPTY and this
            # rejection loop spun forever (seed/data dependent)
            while (sibs[1]["year"] <= sibs[0]["year"]
                   or sibs[1]["year"] == w["year"]):
                sibs[1]["year"] = int(
                    rng.integers(sibs[0]["year"] + 1, 2022))
            diff = w["year"] - sibs[0]["year"]
            q = (f"How many years after the release of the first album "
                 f"on the label {w['label']} was {w['work']} released?")
            a = str(diff)
            extra_aliases = [f"{diff} years"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 25:
            # v10 negated conjunctive: set difference (plus an on-label
            # foil by another performer)
            alts = _performer_works(rng, w, seen_works, count=1)
            sib = _siblings(rng, w, seen_works, count=1)[0]
            q = (f"Which album by {w['person']} was not released on the "
                 f"label {w['label']}?")
            a = alts[0]["work"]
            support = {0}
            extra_support_paras = [_performer_paragraph(alts[0],
                                                        w["person"])]
            extra_foil_paras = [_sibling_paragraph(sib, w["label"], rng)]
        elif kind == 26:
            # v11 inverse-hop anchor: the chain starts at the performer
            # and hop 1 runs against the performed_by edge direction
            q, a = (f"Who is the spouse of the founder of the label that "
                    f"released the album performed by {w['person']}?",
                    w["founder_spouse"])
            support = {0, 3, 4}
        elif kind == 27:
            # v11 unordered temporal distance
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            diff = abs(w["year"] - wb["year"])
            q = (f"How many years apart were {w['work']} and {wb['work']} "
                 f"released?")
            a = str(diff)
            extra_aliases = [f"{diff} years"]
            support = {0}
            extra_support_world = (wb, [0])
        elif kind == 28:
            # v11 count comparative: two labels, different cardinalities
            sib = _siblings(rng, w, seen_works, count=1)[0]
            alt = _unique_worlds(rng, 1, seen_works)[0]
            q = (f"Which label released more albums, {w['label']} or "
                 f"{alt['label']}?")
            a = w["label"]
            support = {0}
            extra_support_paras = [
                _sibling_paragraph(sib, w["label"], rng),
                (f"{alt['work']} (album)",
                 f"{alt['work']} is an album by {alt['person']}. It was "
                 f"released in {alt['year']} on the label {alt['label']}."),
            ]
        elif kind == 29:
            # v11 computed-distance superlative: the anchor work is
            # excluded from its own set; sibling distances are unique
            sibs = _siblings(rng, w, seen_works)
            while (abs(sibs[0]["year"] - w["year"])
                   == abs(sibs[1]["year"] - w["year"])):
                sibs[1]["year"] = int(rng.integers(1950, 2020))
            pick = min(sibs, key=lambda s: abs(s["year"] - w["year"]))
            q = (f"Which album on the label {w['label']} was released "
                 f"closest to {w['work']}?")
            a = pick["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 30:
            # v12 time-scoped relation: marriage history; the right
            # spouse depends on W's release year
            x1, x2 = w["spouse"], _name(rng)
            if rng.random() < 0.5:        # W released during marriage 1
                m1 = w["year"] - 3 - int(rng.integers(0, 10))
                d2 = w["year"] + 2 + int(rng.integers(1, 5))
                m2 = d2 + 1 + int(rng.integers(0, 4))
                a = x1
            else:                          # W released during marriage 2
                m2 = w["year"] - 2 - int(rng.integers(0, 5))
                d2 = m2 - 1 - int(rng.integers(0, 3))
                m1 = d2 - 5 - int(rng.integers(0, 8))
                a = x2
            marriage_history = (
                f"{w['person']} married {x1} in {m1}. {w['person']} and "
                f"{x1} divorced in {d2}. {w['person']} married {x2} in "
                f"{m2}. {w['person']} was born in {w['city']}.")
            q = (f"Who was the spouse of {w['person']} at the time "
                 f"{w['work']} was released?")
            support = {0, 1}
        elif kind == 31:
            # v12 non-year numeric attribute: track counts as NUMBER
            # WORDS; no triple carries them
            wb = worlds[(i + 3) % n]
            ta, tb = 2 + int(rng.integers(0, 18)), 2 + int(rng.integers(0, 18))
            while tb == ta:
                tb = 2 + int(rng.integers(0, 18))
            track_counts = (ta, tb)
            winner = w if ta > tb else wb
            q = (f"Which album has more tracks, {w['work']} or "
                 f"{wb['work']}?")
            a = winner["work"]
            support = {0}
            wb_t, wb_x = _paragraphs(wb, rng)[0]
            wb_x = wb_x.replace(" It features ten tracks.", "")
            extra_support_paras = [
                (wb_t, f"{wb_x} It contains {_NUM_WORDS[tb]} tracks.")]
        elif kind == 32:
            # v12 answer-type coercion: the birth fact names a CITY; the
            # state lives in a separate geography paragraph
            q = (f"In which state was the performer of {w['work']} born?")
            a = _STATES[w["city"]]
            support = {0, 1}
            extra_support_paras = [
                (w["city"], f"{w['city']} is a city in the state of "
                            f"{_STATES[w['city']]}.")]
        elif kind == 33:
            # v12 entity-present unanswerable: W's paragraphs exist but
            # state no producer
            q, a = f"Who produced {w['work']}?", ""
            support = set()
            answerable = False
        elif kind == 34:
            # v13 descriptive person in the temporal join: the spouse
            # history belongs to "the performer of W", year anchors to
            # ANOTHER world's work
            wb = worlds[(i + 3) % n]
            x1, x2 = w["spouse"], _name(rng)
            if rng.random() < 0.5:
                m1 = wb["year"] - 3 - int(rng.integers(0, 10))
                d2 = wb["year"] + 2 + int(rng.integers(1, 5))
                m2 = d2 + 1 + int(rng.integers(0, 4))
                a = x1
            else:
                m2 = wb["year"] - 2 - int(rng.integers(0, 5))
                d2 = m2 - 1 - int(rng.integers(0, 3))
                m1 = d2 - 5 - int(rng.integers(0, 8))
                a = x2
            marriage_history = (
                f"{w['person']} married {x1} in {m1}. {w['person']} and "
                f"{x1} divorced in {d2}. {w['person']} married {x2} in "
                f"{m2}. {w['person']} was born in {w['city']}.")
            q = (f"Who was the spouse of the performer of {w['work']} at "
                 f"the time {wb['work']} was released?")
            support = {0, 1}
            extra_support_world = (wb, [0])
        elif kind == 35:
            # v13 same-STATE equality: the two birth cities may share a
            # state while differing as surfaces
            alt = _unique_worlds(rng, 1, seen_works)[0]
            if w["city"] not in _STATE_PARTNER:
                w["city"] = str(rng.choice(list(_STATE_PARTNER)))
            want_same = bool(rng.random() < 0.5)
            if want_same:
                alt["city"] = _STATE_PARTNER[w["city"]]
            else:
                others = [c for c in _STATES
                          if _STATES[c] != _STATES[w["city"]]]
                alt["city"] = str(rng.choice(others))
            a = "yes" if want_same else "no"
            q = (f"Were the performer of {w['work']} and the performer "
                 f"of {alt['work']} born in the same state?")
            support = {0, 1}
            alt_paras = _paragraphs(alt, rng)
            extra_support_paras = [
                alt_paras[0], alt_paras[1],
                (w["city"], f"{w['city']} is a city in the state of "
                            f"{_STATES[w['city']]}."),
                (alt["city"], f"{alt['city']} is a city in the state of "
                              f"{_STATES[alt['city']]}."),
            ]
        elif kind == 36:
            # v13 successor: min year strictly greater than the anchor's
            sibs = _siblings(rng, w, seen_works)
            sibs[0]["year"] = w["year"] + 1 + int(rng.integers(0, 8))
            while sibs[1]["year"] <= sibs[0]["year"]:
                sibs[1]["year"] = sibs[0]["year"] + 1 + int(
                    rng.integers(0, 10))
            q = (f"Which album on the label {w['label']} was released "
                 f"immediately after {w['work']}?")
            a = sibs[0]["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 37:
            # v13 conjunctive count: |works by P on L| with foils on both
            # constraint sides
            extra_on_l = {"work": None, "year": None}
            while True:
                t = ("".join(rng.choice(_SYL, 2)).capitalize() + " "
                     + str(rng.choice(_WORK_W)))
                y = int(rng.integers(1950, 2020))
                if t not in seen_works and y != w["year"]:
                    seen_works.add(t)
                    extra_on_l = {"work": t, "year": y, "label": w["label"]}
                    break
            off_l = _performer_works(rng, w, seen_works, count=1)[0]
            sib = _siblings(rng, w, seen_works, count=1)[0]
            q = (f"How many albums by {w['person']} were released on the "
                 f"label {w['label']}?")
            a = "2"
            extra_aliases = [_NUM_WORDS[2]]
            support = {0}
            extra_support_paras = [
                _performer_paragraph(extra_on_l, w["person"])]
            extra_foil_paras = [
                _performer_paragraph(off_l, w["person"]),
                _sibling_paragraph(sib, w["label"], rng)]
        elif kind == 38:
            # v14 hop-after-superlative: the argmin work is a SIBLING, so
            # the answer is that sibling's performer — a hop taken on the
            # superlative's output, not on a named entity
            sibs = _siblings(rng, w, seen_works)
            sibs[0]["year"] = w["year"] - 1 - int(rng.integers(0, 10))
            while (sibs[1]["year"] <= sibs[0]["year"]
                   or sibs[1]["year"] == w["year"]):
                sibs[1]["year"] = sibs[0]["year"] + 1 + int(
                    rng.integers(0, 10))
            q = (f"Who performed the first album released on the label "
                 f"{w['label']}?")
            a = sibs[0]["person"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 39:
            # v14 numeric difference: subtraction over word-number track
            # counts; the answer appears in no paragraph
            wb = worlds[(i + 3) % n]
            ta = 3 + int(rng.integers(0, 17))            # 3..19
            tb = 2 + int(rng.integers(0, ta - 2))        # 2..ta-1
            track_counts = (ta, tb)
            q = (f"How many more tracks does {w['work']} have than "
                 f"{wb['work']}?")
            a = str(ta - tb)
            if (ta - tb) in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[ta - tb]]
            support = {0}
            wb_t, wb_x = _paragraphs(wb, rng)[0]
            wb_x = wb_x.replace(" It features ten tracks.", "")
            extra_support_paras = [
                (wb_t, f"{wb_x} It contains {_NUM_WORDS[tb]} tracks.")]
        elif kind == 40:
            # v14 range arithmetic: max-year minus min-year over the label
            # set — both ends resolved from the set, then subtracted
            sibs = _siblings(rng, w, seen_works)
            years = sorted([w["year"]] + [s["year"] for s in sibs])
            q = (f"How many years apart were the first and the last "
                 f"albums released on the label {w['label']}?")
            a = str(years[-1] - years[0])
            if (years[-1] - years[0]) in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[years[-1] - years[0]]]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 41:
            # v14 universal quantification: forall(member.year in decade);
            # the 'no' case hides a single counterexample in the set
            sibs = _siblings(rng, w, seen_works)
            decade = 10 * (w["year"] // 10)
            used = {w["year"]}
            for s in sibs:
                y = decade + int(rng.integers(0, 10))
                while y in used:
                    y = decade + int(rng.integers(0, 10))
                used.add(y)
                s["year"] = y
            want_yes = bool(rng.random() < 0.5)
            if not want_yes:
                sibs[int(rng.integers(0, 2))]["year"] = (
                    decade - 1 - int(rng.integers(0, 15)))
            q = (f"Were all of the albums on the label {w['label']} "
                 f"released in the {decade}s?")
            a = "yes" if want_yes else "no"
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 42:
            # v15 member-by-year + hop: select by YEAR EQUALITY, then hop
            # performed_by on the selected work
            sibs = _siblings(rng, w, seen_works)
            pick = sibs[int(rng.integers(0, 2))]
            q = (f"Who performed the album released on the label "
                 f"{w['label']} in {pick['year']}?")
            a = pick["person"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 43:
            # v15 attribute superlative: argmax over word-number track
            # counts carried by EVERY member paragraph
            sibs = _siblings(rng, w, seen_works)
            counts = [int(c) for c in rng.permutation(
                np.arange(2, 20))[:3]]
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                t, x = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (t, f"{x} It features {_NUM_WORDS[c]} tracks."))
            winner = [w["work"], sibs[0]["work"],
                      sibs[1]["work"]][int(np.argmax(counts))]
            q = (f"Which album on the label {w['label']} has the most "
                 f"tracks?")
            a = winner
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 44:
            # v15 existential quantification: exists(member.year in
            # probe decade); 'no' = NO member qualifies
            sibs = _siblings(rng, w, seen_works)
            years = [w["year"], sibs[0]["year"], sibs[1]["year"]]
            decades = {10 * (y // 10) for y in years}
            probe = int(rng.choice(
                [d for d in range(1950, 2020, 10) if d not in decades]))
            want_yes = bool(rng.random() < 0.5)
            if want_yes:
                y = probe + int(rng.integers(0, 10))
                while y in years:
                    y = probe + int(rng.integers(0, 10))
                sibs[int(rng.integers(0, 2))]["year"] = y
            q = (f"Did any album on the label {w['label']} come out in "
                 f"the {probe}s?")
            a = "yes" if want_yes else "no"
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 45:
            # v15 same-label equality: the same-attribute comparison runs
            # on WORKS via their released_on_label edges
            want_same = bool(rng.random() < 0.5)
            if want_same:
                sib = _siblings(rng, w, seen_works, count=1)[0]
                other_work = sib["work"]
                extra_support_paras = [
                    _sibling_paragraph(sib, w["label"], rng)]
            else:
                alt = _unique_worlds(rng, 1, seen_works)[0]
                other_work = alt["work"]
                extra_support_paras = [_paragraphs(alt, rng)[0]]
            q = (f"Were {w['work']} and {other_work} released on the "
                 f"same label?")
            a = "yes" if want_same else "no"
            support = {0}
        elif kind == 46:
            # v16 two-hop after superlative: superlative -> performed_by
            # -> born_in; the extremum is forced to a SIBLING whose
            # performer gets a birth paragraph
            sibs = _siblings(rng, w, seen_works)
            sibs[0]["year"] = w["year"] + 1 + int(rng.integers(0, 10))
            while (sibs[1]["year"] >= sibs[0]["year"]
                   or sibs[1]["year"] == w["year"]):
                sibs[1]["year"] = sibs[0]["year"] - 1 - int(
                    rng.integers(0, 20))
            city = str(rng.choice(_CITIES))
            q = (f"Where was the performer of the last album released "
                 f"on the label {w['label']} born?")
            a = city
            extra_aliases = [f"{city}, {_STATES[city]}"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
            extra_support_paras.append(
                (sibs[0]["person"],
                 f"{sibs[0]['person']} was born in {city}."))
        elif kind == 47:
            # v16 label of the performer-set superlative: the set anchors
            # on a performer; the answer is the resolved member's LABEL
            extras = _performer_works(rng, w, seen_works)
            members = [{"work": w["work"], "year": w["year"],
                        "label": w["label"]}] + extras
            first = min(members, key=lambda x: x["year"])
            q = f"Which label released the first album by {w['person']}?"
            a = first["label"]
            support = {0}
            extra_support_paras = [
                _performer_paragraph(x, w["person"]) for x in extras]
        elif kind == 48:
            # v16 attribute sum over the set (argmax/diff never aggregate)
            sibs = _siblings(rng, w, seen_works)
            counts = [int(c) for c in rng.permutation(
                np.arange(2, 20))[:3]]
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                t, x = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (t, f"{x} It features {_NUM_WORDS[c]} tracks."))
            q = (f"How many tracks do the albums on the label "
                 f"{w['label']} have in total?")
            a = str(sum(counts))
            if sum(counts) in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[sum(counts)]]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 49:
            # v16 superlative-anchored temporal join: the marriage
            # history's time anchor is the FIRST album on w's label
            sibs = _siblings(rng, w, seen_works)
            anchor_y = min([w["year"]] + [s["year"] for s in sibs])
            x1, x2 = w["spouse"], _name(rng)
            if rng.random() < 0.5:
                m1 = anchor_y - 3 - int(rng.integers(0, 10))
                d2 = anchor_y + 2 + int(rng.integers(1, 5))
                m2 = d2 + 1 + int(rng.integers(0, 4))
                a = x1
            else:
                m2 = anchor_y - 2 - int(rng.integers(0, 5))
                d2 = m2 - 1 - int(rng.integers(0, 3))
                m1 = d2 - 5 - int(rng.integers(0, 8))
                a = x2
            marriage_history = (
                f"{w['person']} married {x1} in {m1}. {w['person']} and "
                f"{x1} divorced in {d2}. {w['person']} married {x2} in "
                f"{m2}. {w['person']} was born in {w['city']}.")
            q = (f"Who was the spouse of the performer of {w['work']} at "
                 f"the time the first album on the label {w['label']} "
                 f"was released?")
            support = {0, 1}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 50:
            # v17 three-step member join: year-equality selection ->
            # performed_by -> born_in
            sibs = _siblings(rng, w, seen_works)
            pick = sibs[int(rng.integers(0, 2))]
            city = str(rng.choice(_CITIES))
            q = (f"Where was the performer of the album released on the "
                 f"label {w['label']} in {pick['year']} born?")
            a = city
            extra_aliases = [f"{city}, {_STATES[city]}"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
            extra_support_paras.append(
                (pick["person"],
                 f"{pick['person']} was born in {city}."))
        elif kind == 51:
            # v17 interval membership: a two-sided year window; the other
            # members sit outside it
            sibs = _siblings(rng, w, seen_works)
            lo = w["year"] - 1 - int(rng.integers(0, 5))
            hi = w["year"] + 1 + int(rng.integers(0, 5))
            for s in sibs:
                while lo <= s["year"] <= hi:
                    s["year"] = int(rng.integers(1950, 2020))
            q = (f"Which album on the label {w['label']} was released "
                 f"between {lo} and {hi}?")
            a = w["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 52:
            # v17 attribute-threshold count: cardinality after a
            # word-number attribute filter
            sibs = _siblings(rng, w, seen_works)
            t = 3 + int(rng.integers(0, 14))             # 3..16
            counts = []
            used = {t}
            while len(counts) < 3:
                c = 2 + int(rng.integers(0, 18))
                if c not in used:
                    used.add(c)
                    counts.append(c)
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            n_over = sum(1 for c in counts if c > t)
            q = (f"How many albums on the label {w['label']} have more "
                 f"than {_NUM_WORDS[t]} tracks?")
            a = str(n_over)
            if n_over in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[n_over]]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 53:
            # v17 inverse hop at chain END: spouse(P) resolves forward,
            # then the work is reached AGAINST the performed_by edge
            w2, l2, y2 = _spouse_album(rng, seen_works)
            q = (f"Which album was performed by the spouse of "
                 f"{w['person']}?")
            a = w2
            support = {1}
            extra_support_paras = [
                (f"{w2} (album)",
                 f"{w2} is an album by {w['spouse']}. It was released "
                 f"in {y2} on the label {l2}.")]
        elif kind == 54:
            # v18 hop-resolved comparative: the compared options are
            # DESCRIPTIVE ("the album performed by X"), not named works
            # — both operands must resolve through reverse performer
            # edges before the year comparison
            wb = worlds[(i + 3) % n]
            if wb["year"] == w["year"]:
                wb = worlds[(i + 7) % n]
            firstw = w if w["year"] < wb["year"] else wb
            q = (f"Which was released first, the album performed by "
                 f"{w['person']} or the album performed by "
                 f"{wb['person']}?")
            a = firstw["work"]
            support = {0}
            extra_support_paras = [_paragraphs(wb, rng)[0]]
        elif kind == 55:
            # v18 attribute-threshold WHICH: the unique member above the
            # word-number cut (kind 52 counts; this one selects)
            sibs = _siblings(rng, w, seen_works)
            t = 3 + int(rng.integers(0, 14))             # 3..16
            own_c = min(19, t + 1 + int(rng.integers(0, 3)))
            track_counts = (own_c, 0)
            sib_paras = []
            for s in sibs:
                c = 2 + int(rng.integers(0, t - 1))      # 2..t
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            q = (f"Which album on the label {w['label']} has more than "
                 f"{_NUM_WORDS[t]} tracks?")
            a = w["work"]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 56:
            # v18 chain-end attribute: inverse hop to the spouse's album
            # (kind 53), then a word-number attribute LOOKUP on it — the
            # answer is a number stated only in the hopped-to paragraph
            w2, l2, y2 = _spouse_album(rng, seen_works)
            c = 2 + int(rng.integers(0, 18))             # 2..19
            q = (f"How many tracks does the album performed by the "
                 f"spouse of {w['person']} have?")
            a = str(c)
            extra_aliases = [_NUM_WORDS[c]]
            support = {1}
            extra_support_paras = [
                (f"{w2} (album)",
                 f"{w2} is an album by {w['spouse']}. It was released "
                 f"in {y2} on the label {l2}. It features "
                 f"{_NUM_WORDS[c]} tracks.")]
        elif kind == 57:
            # v18 dual-label membership: the asked work carries BOTH
            # label edges (primary release + a genuine reissue); each
            # label also has a single-label member, so "both" must
            # intersect the two reverse label sets (the kind-17 trap
            # taught the pipeline to distrust reissue edges — here the
            # reissue is load-bearing)
            sibs = _siblings(rng, w, seen_works)
            l2 = f"{''.join(rng.choice(_SYL, 2)).capitalize()} " \
                 f"{rng.choice(_LABEL_W)}"
            y2 = w["year"] + int(rng.integers(5, 25))
            own_extra_sent = (f"It was later reissued in {y2} on the "
                              f"label {l2}.")
            q = (f"Which album was released both on the label "
                 f"{w['label']} and on the label {l2}?")
            a = w["work"]
            support = {0}
            extra_support_paras = [
                _sibling_paragraph(sibs[0], w["label"], rng),
                _sibling_paragraph(sibs[1], l2, rng)]
        elif kind == 58:
            # v19 hop-resolved conjunctive: "album by the spouse of P on
            # the label L" — the performer operand of the kind-18
            # conjunction must itself resolve through spouse_of; foils
            # bind one constraint each (another album by the spouse on a
            # different label; another album on L by someone else)
            w2, l2, y2 = _spouse_album(rng, seen_works)
            w3, l3, y3 = _spouse_album(rng, seen_works)   # foil: by spouse
            sibs = _siblings(rng, w, seen_works, count=1)  # foil: on label
            q = (f"Which album by the spouse of {w['person']} was "
                 f"released on the label {w['label']}?")
            a = w2
            support = {1}
            extra_support_paras = [
                (f"{w2} (album)",
                 f"{w2} is an album by {w['spouse']}. It was released "
                 f"in {y2} on the label {w['label']}.")]
            extra_foil_paras = [
                (f"{w3} (album)",
                 f"{w3} is an album by {w['spouse']}. It was released "
                 f"in {y3} on the label {l3}."),
                _sibling_paragraph(sibs[0], w["label"], rng)]
        elif kind == 59:
            # v19 superlative member + attribute read: the attr lookup
            # runs on the ARGMIN of the release years, so the proof
            # cites every member's year fact plus the count sentence
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                # draw STRICTLY later years; widen past the generator
                # ceiling so w.year == 2019 still has candidates (the
                # kind-27 regression class: an empty resample interval)
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
            c = 2 + int(rng.integers(0, 18))             # 2..19
            track_counts = (c, 0)
            q = (f"How many tracks does the first album released on "
                 f"the label {w['label']} have?")
            a = str(c)
            extra_aliases = [_NUM_WORDS[c]]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 60:
            # v19 NON-STRICT threshold count: "at least/at most" (the
            # solved comparators are strict more/fewer-than); the gold
            # count differs from the strict reading whenever a member
            # sits exactly ON the cut — one always does
            sibs = _siblings(rng, w, seen_works)
            t = 3 + int(rng.integers(0, 14))             # 3..16
            at_least = bool(rng.integers(0, 2))
            counts = [t]                                  # ON the cut
            used = {t}
            while len(counts) < 3:
                c = 2 + int(rng.integers(0, 18))
                if c not in used:
                    used.add(c)
                    counts.append(c)
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            if at_least:
                n_hit = sum(1 for c in counts if c >= t)
                word = "at least"
            else:
                n_hit = sum(1 for c in counts if c <= t)
                word = "at most"
            q = (f"How many albums on the label {w['label']} have "
                 f"{word} {_NUM_WORDS[t]} tracks?")
            a = str(n_hit)
            if n_hit in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[n_hit]]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 61:
            # v19 universal quantification over an ATTRIBUTE: "do all
            # albums on the label L have more than N tracks?" — the
            # forall machinery exists only for decades; the answer
            # flips on a single counterexample
            sibs = _siblings(rng, w, seen_works)
            t = 3 + int(rng.integers(0, 14))             # 3..16
            yes = bool(rng.integers(0, 2))
            # "no" plants the counterexample on the asked work itself
            own_c = int(rng.integers(t + 1, 20)) if yes \
                else int(rng.integers(2, t + 1))
            track_counts = (own_c, 0)
            sib_paras = []
            for s in sibs:
                c = int(rng.integers(t + 1, 20))
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            q = (f"Do all albums on the label {w['label']} have more "
                 f"than {_NUM_WORDS[t]} tracks?")
            a = "yes" if yes else "no"
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 62:
            # v20 superlative SPAN: the difference runs between two
            # superlative-resolved operands (years_apart resolves two
            # NAMED options; here both are argmin/argmax over the set)
            sibs = _siblings(rng, w, seen_works)
            years = [w["year"]] + [s["year"] for s in sibs]
            span = max(years) - min(years)
            q = (f"How many years apart were the first and last albums "
                 f"released on the label {w['label']}?")
            a = str(span)
            if span in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[span]]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 63:
            # v20 NEGATED decade selection: the decade stage selects the
            # member IN the decade; here exactly one member sits OUTSIDE
            # and the complement is asked
            sibs = _siblings(rng, w, seen_works)
            d0 = (w["year"] // 10) * 10
            in_years = [y for y in range(d0, d0 + 10) if y != w["year"]]
            sibs[0]["year"] = int(
                in_years[int(rng.integers(0, len(in_years)))])
            while True:
                y2 = int(rng.integers(1950, 2020))
                if y2 // 10 != d0 // 10:
                    sibs[1]["year"] = y2
                    break
            q = (f"Which album on the label {w['label']} was not "
                 f"released in the {d0}s?")
            a = sibs[1]["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 64:
            # v20 spouse of the performer of the superlative member: a
            # THREE-step read on the resolved extremum (superlative ->
            # performed_by -> spouse_of); hop2 machinery ends at born_in
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
            q = (f"Who is the spouse of the performer of the first "
                 f"album released on the label {w['label']}?")
            a = w["spouse"]
            support = {0, 1}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 65:
            # v20 decade-FILTERED attribute sum: the total runs over the
            # subset released in the asked decade (attr_sum covers the
            # whole set); every member needs a year to prove membership
            sibs = _siblings(rng, w, seen_works)
            d0 = (w["year"] // 10) * 10
            in_years = [y for y in range(d0, d0 + 10) if y != w["year"]]
            sibs[0]["year"] = int(
                in_years[int(rng.integers(0, len(in_years)))])
            while True:
                y2 = int(rng.integers(1950, 2020))
                if y2 // 10 != d0 // 10:
                    sibs[1]["year"] = y2
                    break
            counts = [int(c) for c in rng.permutation(
                np.arange(2, 20))[:3]]
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            total = counts[0] + counts[1]
            q = (f"How many tracks in total do the albums released on "
                 f"the label {w['label']} in the {d0}s have?")
            a = str(total)
            if total in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[total]]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 66:
            # v21 CROSS-label superlative attribute comparison: resolve
            # the FIRST album of each label independently, read both
            # counts, compare — the answer is a LABEL name
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
            w2 = _unique_worlds(rng, 1, seen_works)[0]
            sibs2 = _siblings(rng, w2, seen_works)
            for s in sibs2:
                s["year"] = int(rng.integers(w2["year"] + 1,
                                             w2["year"] + 40))
            c1, c2 = [int(c) for c in rng.permutation(
                np.arange(2, 20))[:2]]
            track_counts = (c1, 0)
            q = (f"Which label's first album has more tracks, "
                 f"{w['label']} or {w2['label']}?")
            a = w["label"] if c1 > c2 else w2["label"]
            support = {0}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [(f"{w2['work']} (album)",
                    f"{w2['work']} is an album by {w2['person']}. It "
                    f"was released in {w2['year']} on the label "
                    f"{w2['label']}. It features {_NUM_WORDS[c2]} "
                    f"tracks.")]
                + [_sibling_paragraph(s, w2["label"], rng)
                   for s in sibs2])
        elif kind == 67:
            # v21 count over a HOP-RESOLVED set anchor: the label is
            # never named — it resolves through a member work's forward
            # released_on_label edge before the count runs
            sibs = _siblings(rng, w, seen_works)
            q = (f"How many albums were released on the label that "
                 f"released {sibs[0]['work']}?")
            a = "3"
            extra_aliases = ["three"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 68:
            # v21 temporal read on the attribute ARGMAX: the superlative
            # runs over track counts, the answer is the winner's YEAR
            sibs = _siblings(rng, w, seen_works)
            counts = [int(c) for c in rng.permutation(
                np.arange(2, 20))[:3]]
            track_counts = (counts[0], 0)
            sib_paras = []
            for s, c in zip(sibs, counts[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            wyears = [w["year"], sibs[0]["year"], sibs[1]["year"]]
            a = str(wyears[int(np.argmax(counts))])
            q = (f"In what year was the album with the most tracks on "
                 f"the label {w['label']} released?")
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 69:
            # v21 existential over attribute + decade: BOTH filters must
            # bind — the out-of-decade member always exceeds the cut, so
            # skipping the decade filter flips a 'no' to 'yes'
            sibs = _siblings(rng, w, seen_works)
            d0 = (w["year"] // 10) * 10
            in_years = [y for y in range(d0, d0 + 10) if y != w["year"]]
            sibs[0]["year"] = int(
                in_years[int(rng.integers(0, len(in_years)))])
            while True:
                y2 = int(rng.integers(1950, 2020))
                if y2 // 10 != d0 // 10:
                    sibs[1]["year"] = y2
                    break
            t = 3 + int(rng.integers(0, 14))             # 3..16
            yes = bool(rng.integers(0, 2))
            own_c = int(rng.integers(t + 1, 20)) if yes \
                else int(rng.integers(2, t + 1))
            track_counts = (own_c, 0)
            in_c = int(rng.integers(2, t + 1))     # in-decade sib: under
            out_c = int(rng.integers(t + 1, 20))   # out-of-decade trap
            sib_paras = []
            for s, c in zip(sibs, (in_c, out_c)):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            q = (f"Did any album on the label {w['label']} released in "
                 f"the {d0}s have more than {_NUM_WORDS[t]} tracks?")
            a = "yes" if yes else "no"
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 70:
            # v22 superlative hop on an UNNAMED label: the set anchor
            # resolves through a member's forward released_on_label edge
            # (kind 67), THEN the superlative + performer hop run — every
            # solved superlative names its label
            sibs = _siblings(rng, w, seen_works)
            sibs[0]["year"] = int(rng.integers(w["year"] + 1,
                                               w["year"] + 20))
            sibs[1]["year"] = int(rng.integers(w["year"] + 20,
                                               w["year"] + 40))
            q = (f"Who performed the last album released on the label "
                 f"that released {sibs[0]['work']}?")
            a = sibs[1]["person"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 71:
            # v22 decade-bucket count comparison: two decade-filtered
            # counts over ONE label compared as yes/no — the solved
            # machinery filters a single decade or compares label sizes,
            # never counts-per-bucket; a third-decade member is noise
            sibs = _siblings(rng, w, seen_works, count=3)
            d0 = (w["year"] // 10) * 10
            while True:
                d1 = int(rng.integers(195, 202)) * 10
                if d1 != d0:
                    break
            in0 = [y for y in range(d0, d0 + 10) if y != w["year"]]
            more_first = bool(rng.integers(0, 2))
            if more_first:
                # d0: w + sibs[0] (2) vs d1: sibs[1] (1)
                sibs[0]["year"] = int(
                    in0[int(rng.integers(0, len(in0)))])
                sibs[1]["year"] = d1 + int(rng.integers(0, 10))
            else:
                # d0: w (1) vs d1: sibs[0,1] (2)
                y0 = d1 + int(rng.integers(0, 10))
                y1 = d1 + int((y0 - d1 + 1 + rng.integers(0, 9)) % 10)
                sibs[0]["year"], sibs[1]["year"] = y0, y1
            while True:
                y3 = int(rng.integers(1950, 2020))
                if y3 // 10 not in (d0 // 10, d1 // 10):
                    sibs[2]["year"] = y3
                    break
            q = (f"Were more albums on the label {w['label']} released "
                 f"in the {d0}s than in the {d1}s?")
            a = "yes" if more_first else "no"
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 72:
            # v22 cross-label TOTAL attribute comparison: attr_sum per
            # label, then the comparator — kind 66 compares one member
            # per label, the sum stages never compare
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
            w2 = _unique_worlds(rng, 1, seen_works)[0]
            sibs2 = _siblings(rng, w2, seen_works)
            for s in sibs2:
                s["year"] = int(rng.integers(w2["year"] + 1,
                                             w2["year"] + 40))
            while True:
                cs = [int(c) for c in rng.permutation(
                    np.arange(2, 20))[:6]]
                if sum(cs[:3]) != sum(cs[3:]):
                    break
            track_counts = (cs[0], 0)
            sib_paras = []
            for s, c in zip(sibs, cs[1:3]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            sib_paras.append(
                (f"{w2['work']} (album)",
                 f"{w2['work']} is an album by {w2['person']}. It was "
                 f"released in {w2['year']} on the label {w2['label']}. "
                 f"It features {_NUM_WORDS[cs[3]]} tracks."))
            for s, c in zip(sibs2, cs[4:]):
                pt, px = _sibling_paragraph(s, w2["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            q = (f"Which label's albums have more tracks in total, "
                 f"{w['label']} or {w2['label']}?")
            a = w["label"] if sum(cs[:3]) > sum(cs[3:]) else w2["label"]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 73:
            # v22 attribute-equality count join: members whose count
            # equals the NAMED member's — the threshold comparators test
            # against a literal number, never another member's attribute;
            # the naive reading counts w itself (off by one)
            sibs = _siblings(rng, w, seen_works, count=3)
            c0 = 2 + int(rng.integers(0, 18))
            track_counts = (c0, 0)
            n_eq = int(rng.integers(0, 3))               # 0..2 matches
            others = [c for c in range(2, 20) if c != c0]
            rest = [int(others[j]) for j in
                    rng.permutation(len(others))[:3 - n_eq]]
            counts = [c0] * n_eq + rest
            sib_paras = []
            for s, c in zip(sibs, counts):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            q = (f"How many albums on the label {w['label']} have the "
                 f"same number of tracks as {w['work']}?")
            a = str(n_eq)
            extra_aliases = [{0: "zero", 1: "one"}.get(
                n_eq, _NUM_WORDS.get(n_eq))]
            support = {0}
            extra_support_paras = sib_paras
        elif kind == 74:
            # v23 member selection through a 2-hop performer-attribute
            # join: the filter runs on each performer's BIRTH CITY, a
            # fact in a separate paragraph per member — solved member
            # filters read the member's own sentence (year, count)
            sibs = _siblings(rng, w, seen_works)
            cities = [c for c in _CITIES if c != w["city"]]
            picks = rng.permutation(len(cities))[:2]
            c_target = cities[int(picks[0])]
            c_other = cities[int(picks[1])]
            sib_paras = [_sibling_paragraph(s, w["label"], rng)
                         for s in sibs]
            born_paras = [
                (sibs[0]["person"],
                 f"{sibs[0]['person']} was born in {c_target}."),
                (sibs[1]["person"],
                 f"{sibs[1]['person']} was born in {c_other}."),
            ]
            q = (f"Which album on the label {w['label']} was performed "
                 f"by someone born in {c_target}?")
            a = sibs[0]["work"]
            support = {0, 1}          # own work + own performer's city
            extra_support_paras = sib_paras + born_paras
        elif kind == 75:
            # v23 difference of two superlative-resolved attribute
            # reads: attr_difference takes NAMED options; here each
            # operand is the first album of its label
            sibs = _siblings(rng, w, seen_works)
            for s in sibs:
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
            w2 = _unique_worlds(rng, 1, seen_works)[0]
            sibs2 = _siblings(rng, w2, seen_works)
            for s in sibs2:
                s["year"] = int(rng.integers(w2["year"] + 1,
                                             w2["year"] + 40))
            cs = [int(c) for c in rng.permutation(np.arange(2, 20))[:2]]
            c1, c2 = max(cs), min(cs)
            track_counts = (c1, 0)
            q = (f"How many more tracks does the first album released "
                 f"on the label {w['label']} have than the first album "
                 f"released on the label {w2['label']}?")
            a = str(c1 - c2)
            if (c1 - c2) in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[c1 - c2]]
            elif c1 - c2 == 1:
                extra_aliases = ["one"]
            support = {0}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [(f"{w2['work']} (album)",
                    f"{w2['work']} is an album by {w2['person']}. It "
                    f"was released in {w2['year']} on the label "
                    f"{w2['label']}. It features {_NUM_WORDS[c2]} "
                    f"tracks.")]
                + [_sibling_paragraph(s, w2["label"], rng)
                   for s in sibs2])
        elif kind == 76:
            # v23 NEGATED decade count: "not released in the D0s" —
            # count_filtered counts the decade itself; the complement
            # must subtract from the full membership
            sibs = _siblings(rng, w, seen_works, count=3)
            d0 = (w["year"] // 10) * 10
            n_out = 1 + int(rng.integers(0, 3))          # 1..3 outside
            in0 = [y for y in range(d0, d0 + 10) if y != w["year"]]
            used_in = set()
            for j, s in enumerate(sibs):
                if j < n_out:
                    while True:
                        y = int(rng.integers(1950, 2020))
                        if y // 10 != d0 // 10:
                            s["year"] = y
                            break
                else:
                    while True:
                        y = int(in0[int(rng.integers(0, len(in0)))])
                        if y not in used_in:
                            used_in.add(y)
                            s["year"] = y
                            break
            q = (f"How many albums on the label {w['label']} were not "
                 f"released in the {d0}s?")
            a = str(n_out)
            extra_aliases = [{1: "one"}.get(n_out, _NUM_WORDS.get(n_out))]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 77:
            # v23 decade-FILTERED attribute superlative: the argmax runs
            # only over in-decade members; the out-of-decade trap member
            # carries the GLOBAL max count, so skipping the filter
            # answers with the trap
            sibs = _siblings(rng, w, seen_works, count=3)
            d0 = (w["year"] // 10) * 10
            in0 = [y for y in range(d0, d0 + 10) if y != w["year"]]
            sibs[0]["year"] = int(in0[int(rng.integers(0, len(in0)))])
            for s in sibs[1:]:
                while True:
                    y = int(rng.integers(1950, 2020))
                    if y // 10 != d0 // 10:
                        s["year"] = y
                        break
            cs = [int(c) for c in rng.permutation(np.arange(2, 19))[:3]]
            track_counts = (cs[0], 0)
            winner = w["work"] if cs[0] > cs[1] else sibs[0]["work"]
            q = (f"Which album on the label {w['label']} released in "
                 f"the {d0}s has the most tracks?")
            a = winner
            support = {0}
            sib_paras = []
            for s, c in zip(sibs, (cs[1], 19, cs[2])):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            extra_support_paras = sib_paras
        elif kind == 78:
            # v24 attribute ORDINAL: "second most tracks" — the solved
            # ordinal stage ranks release years, the attr superlative
            # takes only the extremum
            sibs = _siblings(rng, w, seen_works, count=3)
            cs = [int(c) for c in rng.permutation(np.arange(2, 20))[:4]]
            track_counts = (cs[0], 0)
            order = sorted(range(4), key=lambda j: -cs[j])
            second = order[1]
            works = [w["work"]] + [s["work"] for s in sibs]
            q = (f"Which album on the label {w['label']} has the "
                 f"second most tracks?")
            a = works[second]
            support = {0}
            sib_paras = []
            for s, c in zip(sibs, cs[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            extra_support_paras = sib_paras
        elif kind == 79:
            # v24 decade MODE: argmax over decade buckets, answered as
            # a decade surface ("the 1980s") — every solved decade stage
            # filters or compares, never aggregates to the bucket itself
            sibs = _siblings(rng, w, seen_works, count=3)
            d0 = (w["year"] // 10) * 10
            while True:
                d1 = int(rng.integers(195, 202)) * 10
                if d1 != d0:
                    break
            in0 = [y for y in range(d0, d0 + 10) if y != w["year"]]
            # d0 holds w + sibs[0] (2 members), d1 holds sibs[1] (1),
            # sibs[2] lands in a third decade (1)
            sibs[0]["year"] = int(in0[int(rng.integers(0, len(in0)))])
            sibs[1]["year"] = d1 + int(rng.integers(0, 10))
            while True:
                y3 = int(rng.integers(1950, 2020))
                if y3 // 10 not in (d0 // 10, d1 // 10):
                    sibs[2]["year"] = y3
                    break
            q = (f"In which decade were the most albums on the label "
                 f"{w['label']} released?")
            a = f"{d0}s"
            extra_aliases = [f"the {d0}s", f"{d0}'s"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 80:
            # v24 yes/no attribute comparison of two SUPERLATIVE
            # operands over one label: both resolve before the count
            # comparison (the solved yesno compares release YEARS of
            # named options)
            sibs = _siblings(rng, w, seen_works)
            used_years = {w["year"]}
            for s in sibs:
                # distinct years: a tied max leaves "the last album"
                # ill-defined (seed-9 synth_174 drew 1974 twice)
                s["year"] = int(rng.integers(w["year"] + 1,
                                             w["year"] + 40))
                while s["year"] in used_years:
                    s["year"] = int(rng.integers(w["year"] + 1,
                                                 w["year"] + 40))
                used_years.add(s["year"])
            last = max(sibs, key=lambda s: s["year"])
            other = sibs[0] if last is sibs[1] else sibs[1]
            cs = [int(c) for c in rng.permutation(np.arange(2, 20))[:3]]
            track_counts = (cs[0], 0)     # w = the FIRST album
            yes = cs[0] > cs[1]           # cs[1] = the LAST album's count
            q = (f"Does the first album released on the label "
                 f"{w['label']} have more tracks than the last album "
                 f"released on the label {w['label']}?")
            a = "yes" if yes else "no"
            support = {0}
            sib_paras = []
            for s, c in ((last, cs[1]), (other, cs[2])):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            extra_support_paras = sib_paras
        elif kind == 81:
            # v24 combined count across TWO labels: the count's set is
            # the union of two memberships (every solved count anchors
            # one label)
            sibs = _siblings(rng, w, seen_works,
                             count=1 + int(rng.integers(0, 2)))
            w2 = _unique_worlds(rng, 1, seen_works)[0]
            sibs2 = _siblings(rng, w2, seen_works,
                              count=1 + int(rng.integers(0, 2)))
            total = (1 + len(sibs)) + (1 + len(sibs2))
            q = (f"How many albums were released on the labels "
                 f"{w['label']} and {w2['label']} combined?")
            a = str(total)
            if total in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[total]]
            support = {0}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [(f"{w2['work']} (album)",
                    f"{w2['work']} is an album by {w2['person']}. It "
                    f"was released in {w2['year']} on the label "
                    f"{w2['label']}.")]
                + [_sibling_paragraph(s, w2["label"], rng)
                   for s in sibs2])
        elif kind == 82:
            # v25 attribute AVERAGE: "the average number of tracks" —
            # a new arithmetic op (mean); every solved aggregate is a
            # sum, difference, count, or extremum. Counts are drawn so
            # the mean is an integer.
            sibs = _siblings(rng, w, seen_works, count=3)
            while True:
                cs = [int(c) for c in rng.permutation(np.arange(2, 20))[:4]]
                if sum(cs) % 4 == 0:
                    break
            track_counts = (cs[0], 0)
            q = (f"What is the average number of tracks across the "
                 f"albums on the label {w['label']}?")
            avg = sum(cs) // 4
            a = str(avg)
            if avg in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[avg]]
            support = {0}
            sib_paras = []
            for s, c in zip(sibs, cs[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            extra_support_paras = sib_paras
        elif kind == 83:
            # v25 MULTI-ANSWER enumeration: the gold is a SET of two
            # titles ("A and B") — every solved kind answers with one
            # span/number/polarity; selection must collect ALL decade
            # members, not the best one
            sibs = _siblings(rng, w, seen_works, count=3)
            d0 = (w["year"] // 10) * 10
            in0 = [y for y in range(d0, d0 + 10) if y != w["year"]]
            sibs[0]["year"] = int(in0[int(rng.integers(0, len(in0)))])
            for s in sibs[1:]:
                while True:
                    y = int(rng.integers(1950, 2020))
                    if y // 10 != d0 // 10:
                        s["year"] = y
                        break
            members = sorted([(w["year"], w["work"]),
                              (sibs[0]["year"], sibs[0]["work"])])
            m0, m1 = members[0][1], members[1][1]
            q = (f"Which albums on the label {w['label']} were released "
                 f"in the {d0}s?")
            a = f"{m0} and {m1}"
            extra_aliases = [f"{m1} and {m0}", f"{m0}, {m1}",
                             f"{m1}, {m0}", f"{m0} & {m1}"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 84:
            # v25 NEGATIVE existence over a performer-label pair: "Did P
            # release an album on the label L2?" where P's album is on L
            # — the polarity comes from the ABSENCE of an edge, so a
            # finder that stops at "no evidence" must still answer "no"
            # (and the yes half keeps a constant-answer strategy at 0.5)
            yes = bool(rng.random() < 0.5)
            if yes:
                q = (f"Did {w['person']} release an album on the label "
                     f"{w['label']}?")
                a = "yes"
                support = {0}
            else:
                w2 = _unique_worlds(rng, 1, seen_works)[0]
                q = (f"Did {w['person']} release an album on the label "
                     f"{w2['label']}?")
                a = "no"
                support = {0}
                extra_support_paras = [
                    (f"{w2['work']} (album)",
                     f"{w2['work']} is an album by {w2['person']}. It "
                     f"was released in {w2['year']} on the label "
                     f"{w2['label']}.")]
        elif kind == 85:
            # v25 HOP-RESOLVED threshold count: "released after W" — the
            # threshold year is not written in the question; it must be
            # read off the anchor member first (solved threshold counts
            # take a literal year/count from the question)
            sibs = _siblings(rng, w, seen_works, count=3)
            n_after = int(rng.integers(1, 4))            # 1..3 after w
            lo = [y for y in range(1950, w["year"])]
            hi = [y for y in range(w["year"] + 1, 2020)]
            if not lo or len(hi) < 3:
                w["year"] = 1985
                lo = [y for y in range(1950, 1985)]
                hi = [y for y in range(1986, 2020)]
            used = set()
            for j, s in enumerate(sibs):
                pool = hi if j < n_after else lo
                while True:
                    y = int(pool[int(rng.integers(0, len(pool)))])
                    if y not in used:
                        used.add(y)
                        s["year"] = y
                        break
            q = (f"How many albums on the label {w['label']} were "
                 f"released after {w['work']}?")
            a = str(n_after)
            extra_aliases = [{1: "one"}.get(n_after,
                                            _NUM_WORDS.get(n_after))]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 86:
            # v26 REVERSE ordinal: "second most recent" ranks DESCENDING
            # by year (the solved ordinal stage counts from the first
            # release)
            sibs = _siblings(rng, w, seen_works, count=3)
            works = sorted([(w["year"], w["work"])]
                           + [(s["year"], s["work"]) for s in sibs],
                           reverse=True)
            q = (f"What was the second most recent album released on "
                 f"the label {w['label']}?")
            a = works[1][1]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 87:
            # v26 performer INTERSECTION across labels: the answer is
            # the PERSON whose membership spans both rosters (the solved
            # label intersection goes the other way: works -> label)
            sibs = _siblings(rng, w, seen_works, count=1)
            w2 = _unique_worlds(rng, 1, seen_works)[0]
            sibs2 = _siblings(rng, w2, seen_works, count=1)
            extra = _performer_works(rng, w, seen_works, count=1)[0]
            extra["label"] = w2["label"]
            q = (f"Which performer released albums on both the labels "
                 f"{w['label']} and {w2['label']}?")
            a = w["person"]
            support = {0}
            extra_support_paras = [
                _performer_paragraph(extra, w["person"])]
            extra_foil_paras = (
                [(f"{w2['work']} (album)",
                  f"{w2['work']} is an album by {w2['person']}. It was "
                  f"released in {w2['year']} on the label "
                  f"{w2['label']}.")]
                + [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [_sibling_paragraph(s, w2["label"], rng)
                   for s in sibs2])
        elif kind == 88:
            # v26 anchor-relative WINDOW count: a two-sided hop-resolved
            # interval |year - anchor| <= N (v25's after/before is
            # one-sided)
            sibs = _siblings(rng, w, seen_works, count=3)
            if w["year"] < 1958 or w["year"] > 2011:
                w["year"] = int(rng.integers(1965, 2005))
            nwin = int(rng.integers(3, 8))
            n_in = 1 + int(rng.integers(0, 3))          # 1..3 inside
            used = {w["year"]}
            for j, s in enumerate(sibs):
                while True:
                    if j < n_in:
                        y = w["year"] + int(rng.integers(-nwin, nwin + 1))
                    else:
                        y = int(rng.integers(1950, 2020))
                        if abs(y - w["year"]) <= nwin:
                            continue
                    if 1950 <= y < 2020 and y not in used:
                        used.add(y)
                        s["year"] = y
                        break
            q = (f"How many albums on the label {w['label']} were "
                 f"released within {nwin} years of {w['work']}?")
            a = str(n_in)
            extra_aliases = [{1: "one"}.get(n_in, _NUM_WORDS.get(n_in))]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 89:
            # v26 option-resolved 2-hop selection: "Whose spouse was
            # born in C: P1 or P2?" — each OPTION resolves spouse_of ->
            # born_in before the filter picks one (the solved same-city
            # kind compares two resolved cities for a yes/no)
            w2 = next((o for o in worlds[i + 1:] + worlds[:i]
                       if o is not w
                       and o["spouse_city"] != w["spouse_city"]
                       and o["work"] != w["work"]), None)
            if w2 is None:
                w2 = worlds[(i + 5) % n]
            p1, p2 = w["person"], w2["person"]
            if rng.random() < 0.5:
                p1, p2 = p2, p1
            q = (f"Whose spouse was born in {w['spouse_city']}: "
                 f"{p1} or {p2}?")
            a = w["person"]
            support = {1, 2}
            extra_support_world = (w2, [1, 2])
        elif kind == 90:
            # v27 two-anchor interval count: "released between W1 and
            # W2" — BOTH bounds hop-resolved from anchor members
            # (v17 interval takes literal years; v26 window takes one
            # anchor + a literal width), exclusive of the anchors
            sibs = _siblings(rng, w, seen_works, count=4)
            if w["year"] > 1995:
                w["year"] = int(rng.integers(1955, 1995))
            gap = int(rng.integers(10, 24))
            y1, y2 = w["year"], w["year"] + gap
            anchor2 = sibs[0]
            anchor2["year"] = y2
            n_in = 1 + int(rng.integers(0, 2))          # 1..2 inside
            used = {y1, y2}
            for j, s in enumerate(sibs[1:]):
                while True:
                    if j < n_in:
                        y = int(rng.integers(y1 + 1, y2))
                    else:
                        y = int(rng.integers(1950, 2020))
                        if y1 <= y <= y2:
                            continue
                    if 1950 <= y < 2020 and y not in used:
                        used.add(y)
                        s["year"] = y
                        break
            q = (f"How many albums on the label {w['label']} were "
                 f"released between {w['work']} and {anchor2['work']}?")
            a = str(n_in)
            extra_aliases = [{1: "one"}.get(n_in, _NUM_WORDS.get(n_in))]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 91:
            # v27 FOUR-step chain on the resolved extremum: superlative
            # -> performed_by -> spouse_of -> born_in (superlative_spouse
            # stops at the marriage edge; this reads the spouse's city)
            sibs = _siblings(rng, w, seen_works, count=3)
            # Clamp the anchor year upward so >=3 free years exist below
            # it (rng.integers(1950, 1950) raises; 1951-1952 leaves fewer
            # free years than siblings -> the collision loop never exits).
            if w["year"] < 1956:
                w["year"] = int(rng.integers(1956, 2020))
            for s in sibs:
                if s["year"] >= w["year"]:
                    s["year"] = int(rng.integers(1950, w["year"]))
                    while s["year"] in {x["year"] for x in sibs
                                        if x is not s} | {w["year"]}:
                        s["year"] = int(rng.integers(1950, w["year"]))
            q = (f"In which city was the spouse of the performer of the "
                 f"most recent album released on the label {w['label']} "
                 f"born?")
            a, akey = w["spouse_city"], "spouse_city"
            support = {0, 1, 2}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 92:
            # v27 DISTINCT count over a hop-resolved attribute: each
            # member's performer resolves born_in, then the count
            # deduplicates cities (solved counts tally members directly)
            sibs = _siblings(rng, w, seen_works, count=3)
            others = [c for c in _CITIES if c != w["city"]]
            picks = rng.permutation(len(others))
            n_extra = int(rng.integers(1, 3))           # 1..2 fresh cities
            pool = [w["city"]] + [others[int(p)]
                                  for p in picks[:n_extra]]
            sib_cities = [pool[int(rng.integers(0, len(pool)))]
                          for _ in sibs]
            n_distinct = len(set([w["city"]] + sib_cities))
            q = (f"In how many different cities were the performers of "
                 f"the albums on the label {w['label']} born?")
            a = str(n_distinct)
            extra_aliases = [{1: "one"}.get(n_distinct,
                                            _NUM_WORDS.get(n_distinct))]
            support = {0, 1}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [(s["person"], f"{s['person']} was born in {c}.")
                   for s, c in zip(sibs, sib_cities)])
        elif kind == 93:
            # v27 same-year selection: "Which album on the label L was
            # released in the same year as W?" — the filter year is
            # hop-resolved AND the equality must tolerate the tied pair
            # (every solved superlative/ordinal refuses ties)
            sibs = _siblings(rng, w, seen_works, count=3)
            twin = sibs[0]
            twin["year"] = w["year"]
            twin["date"] = None
            q = (f"Which album on the label {w['label']} was released "
                 f"in the same year as {w['work']}?")
            a = twin["work"]
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 94:
            # v28 cross-label performer intersection: the performer with
            # albums on BOTH named labels (label-set members hop to their
            # performers; the answer is the one in both sets — performer_
            # intersection (kind 86) anchors on two WORKS, this on two
            # LABEL SETS)
            sibs = _siblings(rng, w, seen_works, count=2)
            x = _performer_works(rng, w, seen_works, count=1)[0]
            sibs2 = _siblings(rng, {"label": x["label"],
                                    "year": x["year"]},
                              seen_works, count=2)
            q = (f"Which performer released albums on both the label "
                 f"{w['label']} and the label {x['label']}?")
            a, akey = w["person"], "person"
            support = {0}
            extra_support_paras = [_performer_paragraph(x, w["person"])]
            extra_foil_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [_sibling_paragraph(s, x["label"], rng) for s in sibs2])
        elif kind == 95:
            # v28 unique-decade member: the only album of its label set
            # released in the named decade (a uniqueness read on the
            # decade filter — count stages tally, selection stages rank;
            # this must FILTER then assert |bucket| == 1)
            sibs = _siblings(rng, w, seen_works, count=3)
            dec = (w["year"] // 10) * 10
            for s in sibs:
                while (s["year"] // 10) * 10 == dec or \
                        s["year"] in {x["year"] for x in sibs
                                      if x is not s} | {w["year"]}:
                    s["year"] = int(rng.integers(1950, 2020))
            q = (f"Which album on the label {w['label']} was the only "
                 f"one released in the {dec}s?")
            a, akey = w["work"], "work"
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 96:
            # v28 cross-set chained interval: years between the FIRST
            # album of one label and the LAST album of another — two
            # independently superlative-resolved anchors subtracted
            # (kind 62 spans within ONE set)
            sibs = _siblings(rng, w, seen_works, count=2)
            label2 = _fresh_label(rng, seen_works)
            lead2 = {"work": _fresh_work(rng, seen_works),
                     "person": _name(rng),
                     "year": int(rng.integers(1950, 2020)), "date": None}
            sibs2 = _siblings(rng, {"label": label2,
                                    "year": lead2["year"]},
                              seen_works, count=2)
            y_first = min([w["year"]] + [s["year"] for s in sibs])
            y_last = max([lead2["year"]] + [s["year"] for s in sibs2])
            if y_last < y_first:   # keep the phrasing's direction true
                delta = y_first - y_last
                q = (f"How many years before the first album on the "
                     f"label {w['label']} was the last album on the "
                     f"label {label2} released?")
            else:
                delta = y_last - y_first
                q = (f"How many years after the first album on the "
                     f"label {w['label']} was the last album on the "
                     f"label {label2} released?")
            a = str(delta)
            extra_aliases = [{0: "zero", 1: "one"}.get(
                delta, _NUM_WORDS.get(delta))]
            support = {0}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [_sibling_paragraph(lead2, label2, rng)]
                + [_sibling_paragraph(s, label2, rng) for s in sibs2])
        elif kind == 97:
            # v28 modal birth city: the city MOST of the label's
            # performers were born in — argmax of multiplicity over the
            # hop-resolved attribute (kind 92 counts the distinct
            # values; this ranks them and must refuse ties)
            sibs = _siblings(rng, w, seen_works, count=4)
            others = [c for c in _CITIES if c != w["city"]]
            picks = rng.permutation(len(others))
            # 2 sibs share w's city (3-of-5 majority), 2 get distinct
            # fresh cities — no tie is possible
            sib_cities = [w["city"], w["city"],
                          others[int(picks[0])], others[int(picks[1])]]
            q = (f"In which city were most of the performers of the "
                 f"albums on the label {w['label']} born?")
            a, akey = w["city"], "city"
            support = {0, 1}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [(s["person"], f"{s['person']} was born in "
                                 f"{_city_surface(c, rng)}.")
                   for s, c in zip(sibs, sib_cities)])
        elif kind == 98:
            # v29 attribute MEDIAN: order statistic over the label set's
            # track counts — every solved aggregate is a sum, mean,
            # difference, count, or extremum; the median needs a SORT
            sibs = _siblings(rng, w, seen_works, count=4)
            cs = [int(c) for c in rng.permutation(np.arange(2, 20))[:5]]
            track_counts = (cs[0], 0)
            q = (f"What is the median number of tracks across the "
                 f"albums on the label {w['label']}?")
            med = sorted(cs)[2]
            a = str(med)
            if med in _NUM_WORDS:
                extra_aliases = [_NUM_WORDS[med]]
            support = {0}
            sib_paras = []
            for s, c in zip(sibs, cs[1:]):
                pt, px = _sibling_paragraph(s, w["label"], rng)
                sib_paras.append(
                    (pt, f"{px} It features {_NUM_WORDS[c]} tracks."))
            extra_support_paras = sib_paras
        elif kind == 99:
            # v29 two-anchor interval SELECTION: the label member whose
            # year lies strictly between two named members' years (kind
            # 90 COUNTS the interval; this must select the unique member
            # inside it — both anchors resolve through their own pages)
            sibs = _siblings(rng, w, seen_works, count=4)
            ys = sorted(s["year"] for s in sibs)
            lo = next(s for s in sibs if s["year"] == ys[0])
            hi = next(s for s in sibs if s["year"] == ys[3])
            # w strictly inside, the other two sibs strictly outside
            if not (ys[0] < w["year"] < ys[3]):
                w = dict(w)
                w["year"] = (ys[0] + ys[3]) // 2
            for s in sibs:
                if s in (lo, hi):
                    continue
                while ys[0] < s["year"] < ys[3] or s["year"] in (
                        w["year"], ys[0], ys[3]):
                    s["year"] = int(rng.integers(1940, 1950)) if \
                        rng.random() < 0.5 else int(rng.integers(2020, 2030))
            q = (f"Which album on the label {w['label']} was released "
                 f"after {lo['work']} but before {hi['work']}?")
            a, akey = w["work"], "work"
            support = {0}
            extra_support_paras = [_sibling_paragraph(s, w["label"], rng)
                                   for s in sibs]
        elif kind == 100:
            # v29 spouse-founder 3-hop AGGREGATION: P -> spouse ->
            # label the spouse founded -> member count (kind 6 walks
            # founder->spouse forward; this walks person->spouse then
            # AGAINST the founded_by edge, then aggregates)
            l2 = _fresh_label(rng, seen_works)
            members = _siblings(
                rng, {"year": int(rng.integers(1950, 2020))},
                seen_works, count=3)
            q = (f"How many albums were released on the label founded "
                 f"by the spouse of {w['person']}?")
            a = "3"
            extra_aliases = ["three"]
            support = {1}
            extra_support_paras = (
                [(l2, f"{l2} is a record label. {l2} was founded by "
                      f"{w['spouse']}.")]
                + [_sibling_paragraph(s, l2, rng) for s in members])
        else:
            # v29 shared-performer COUNT across two label sets: how many
            # performers appear in BOTH label rosters (kind 94 selects
            # the single shared performer; this counts a 2-element
            # intersection, so selection-shaped stages must not fire)
            sibs = _siblings(rng, w, seen_works, count=2)
            l2 = _fresh_label(rng, seen_works)
            shared2 = sibs[0]["person"]
            solo2 = _name(rng)
            y2 = {int(x) for x in rng.choice(
                np.arange(1950, 2020), 3, replace=False)}
            works2 = [{"work": _fresh_work(rng, seen_works), "person": p,
                       "year": y, "date": None}
                      for p, y in zip((w["person"], shared2, solo2),
                                      sorted(y2))]
            q = (f"How many performers released albums on both the "
                 f"label {w['label']} and the label {l2}?")
            a = "2"
            extra_aliases = ["two"]
            support = {0}
            extra_support_paras = (
                [_sibling_paragraph(s, w["label"], rng) for s in sibs]
                + [_sibling_paragraph(s, l2, rng) for s in works2])
        # confusables first: the negation trap names the first one's label
        suffix = w["work"].split()[-1]
        confus = _unique_worlds(rng, 2, seen_works, work_suffix=suffix)
        own = _paragraphs(w, rng,
                          foil_label=None if reissue else confus[0]["label"],
                          abbr_ok=True, stage_name=stage_name)
        if reissue:
            # the reissue edge leads into confus[0]'s LIVE founder chain
            # (its label+founder paragraphs ride along below) — a wrong
            # answer, not a dead end
            y2 = w["year"] + int(rng.integers(8, 30))
            t0, x0 = own[0]
            own[0] = (t0, f"{x0} " + _pick(rng, _REISSUE_T).format(
                Y2=y2, FOIL=confus[0]["label"]))
        if marriage_history is not None:
            own[1] = (own[1][0], marriage_history)
        if track_counts is not None:
            t0, x0 = own[0]
            x0 = x0.replace(" It features ten tracks.", "")
            own[0] = (t0, f"{x0} It features "
                          f"{_NUM_WORDS[track_counts[0]]} tracks.")
        if own_extra_sent is not None:
            t0, x0 = own[0]
            own[0] = (t0, f"{x0} {own_extra_sent}")
        paras = []
        for pi, (title, text) in enumerate(own):
            paras.append({"idx": len(paras), "title": title,
                          "paragraph_text": text,
                          "is_supporting": pi in support})
        if extra_support_world is not None:
            ew, epis = extra_support_world
            eparas = _paragraphs(ew, rng)
            for pi in epis:
                title, text = eparas[pi]
                paras.append({"idx": len(paras), "title": title,
                              "paragraph_text": text, "is_supporting": True})
        for title, text in extra_support_paras:
            paras.append({"idx": len(paras), "title": title,
                          "paragraph_text": text, "is_supporting": True})
        for title, text in extra_foil_paras:
            paras.append({"idx": len(paras), "title": title,
                          "paragraph_text": text, "is_supporting": False})
        # two CONFUSABLE distractor worlds: same work-title suffix; the
        # first carries its label+founder paragraphs so the negation
        # foil's forged chain leads somewhere REAL (a wrong answer, not a
        # dead end)
        for ci, cw in enumerate(confus):
            for title, text in _paragraphs(cw, rng)[:5 if ci == 0 else 3]:
                paras.append({"idx": len(paras), "title": title,
                              "paragraph_text": text, "is_supporting": False})
        # regular distractors from other items' worlds — EXCLUDING any
        # world already present in this item (kind-specific picks like
        # worlds[(i+3)%n] ride in as extra support; drawing the same
        # world again would add an UNLABELED duplicate paragraph the
        # pipeline can legitimately cite, corrupting support golds — and
        # for the track-count kinds, a contradictory count surface)
        present = {p["title"] for p in paras}
        pool = [j for j in range(n)
                if j != i and f"{worlds[j]['work']} (album)" not in present]
        others = rng.choice(pool, min(distractors, len(pool)),
                            replace=False)
        for j in others:
            take = 1 + int(rng.integers(0, 3))
            for title, text in _paragraphs(worlds[j], rng)[:take]:
                paras.append({"idx": len(paras), "title": title,
                              "paragraph_text": text, "is_supporting": False})
        order = rng.permutation(len(paras))
        remap = [paras[k] for k in order]
        for new_idx, p in enumerate(remap):
            p["idx"] = new_idx
        item = {"id": f"synth_{i}", "question": q, "answer": a,
                "answerable": answerable, "paragraphs": remap}
        if akey:
            item["answer_aliases"] = _aliases(w, akey)
        elif extra_aliases:
            item["answer_aliases"] = extra_aliases
        items.append(item)
    return items


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--distractors", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    items = make_items(args.n, args.distractors, args.seed)
    with open(args.out, "w") as fh:
        for it in items:
            fh.write(json.dumps(it) + "\n")
    kinds = {}
    for i, it in enumerate(items):
        kinds[i % N_KINDS] = kinds.get(i % N_KINDS, 0) + 1
    n_multi = sum(v for k, v in kinds.items()
                  if k in (0, 1, 4, 5, 6, 9, 16, 17, 26, 30, 32, 34, 35,
                           46, 49, 50, 53))
    n_unans = kinds.get(7, 0) + kinds.get(33, 0)
    n_agg = sum(kinds.get(k, 0)
                for k in (10, 11, 12, 13, 14, 15, 19, 20, 21,
                          22, 23, 24, 25, 27, 28, 29, 31, 36, 37,
                          38, 39, 40, 41, 42, 43, 44, 45, 47, 48,
                          51, 52))
    print(f"wrote {len(items)} items ({n_multi} multi-hop, {n_unans} "
          f"unanswerable, {n_agg} aggregation, kinds 0-{N_KINDS - 1} "
          f"cycle) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
