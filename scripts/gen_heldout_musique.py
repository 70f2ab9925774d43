"""Held-out paraphrase sheet: the solver-blind eval protocol.

Takes the standard synthetic items (scripts/gen_synth_musique.py — the
94-kind cycle the solver WAS tuned on) and rewrites question and evidence
SURFACES with paraphrase rules authored in this file only. The rules are
deliberately kept out of the solver's sight: nothing in anorag_tpu/ may
import this module or mirror its phrase bank, and the measured floor is
recorded WITHOUT same-session solver patches (VERDICT r3 next-step #1 —
the reference's protocol is an external dataset + fixed official scorer,
/root/reference/run_evaluation.py:29-60; this is the in-image stand-in).

Semantics are preserved exactly: rewrites touch template words only, never
entity names, years, dates, or number words, so every gold answer, alias
list, and support label of the source item remains valid verbatim.

Usage:
    python scripts/gen_heldout_musique.py out.jsonl --n 188 --seed 77
"""
from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


# --------------------------------------------------------------- evidence
# Each rule: (compiled pattern over one PARAGRAPH, list of replacement
# templates). Replacements reuse the captured entity/number groups, so the
# facts survive; only the connective tissue changes. Patterns anchor on
# the generator's sentence templates (generator-aware is fair game — the
# protocol is blind to the SOLVER, not the data-maker).
_E = [
    # perform: "P recorded the album W."
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"The album \2 was laid down by \1.",
      r"\2 is a recording by \1."]),
    # perform: "W is an album performed by P." / "... by P." / "a record by P."
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"\1 is an album; the performing artist is \2.",
      r"On \1, the performance is by \2."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"\1 is a \2 whose credited artist is \3.",
      r"\1 — a \2 from \3."]),
    # release (year form): "It was released in Y on the label L."
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 released it in \1.",
      r"Its release, in \1, came via the label \2."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 brought it out in \1."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"The label \2 put it out in \1."]),
    # release (dated form): "It was released on D Y on the label L."
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 released it on \1."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"The label \2 issued it on \1."]),
    # appositive: "W, an album by P, was released R on the label L."
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"Released \3 on the label \4, \1 is an album by \2."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"Issued \3 on the label \4, \1 is a record by \2."]),
    # spouse: "X married Y." / "X wed Y." / "X's spouse is Y."
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) married ([^.]+)\."),
     [r"\1 and \2 married."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) wed ([^.]+)\."),
     [r"\1 and \2 wed."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"\2 is the spouse of \1."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"\2 is \1's spouse."]),
    # born: "X was born in C." / "X is a native of C." / "X hails from C."
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\2 is the birthplace of \1.",
      r"\1's place of birth is \2."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\1's home town is \2."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1 comes from \2."]),
    # founded: "L was founded by F." / "F established L." / "F founded L."
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\2 set up \1."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\2 got \1 off the ground."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"\2 was established by \1."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\2 was founded by \1."]),
    # tracks: "It features N tracks."
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"There are \1 tracks on it.",
      r"The track count is \1."]),
    # marriage restatement: "X is married to Y."
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"\1's marriage is to \2."]),
]

# ----------------------------------------------------------- bank v2
# Authored AFTER the v1 bank's phrasings leaked into the solver's general
# lexical layer (utils/lexnorm.py, round 4) — per the protocol in
# HELDOUT.md, a contaminated bank is demoted to a dev sheet and a fresh
# one is authored and measured without same-session solver patches.
# These rules are written as fluent-human paraphrases; they neither copy
# v1's replacement surfaces nor aim at/away from the solver's lemma
# tables.
_E2 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"The album \2 was cut in the studio by \1.",
      r"\2 is the work of \1, who made the album."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"\1, an album, carries \2 as its credited artist.",
      r"The voice on the album \1 belongs to \2."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"\1 is \3's \2.",
      r"Among \3's output is the \2 \1."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"\1 was the year the label \2 brought it to market.",
      r"Its arrival, via the label \2, dates to \1."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"Its debut came in \1 under the label \2."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"The label \2 delivered it to shelves in \1."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 shipped it on \1."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"On \1, the label \2 sent it into the world."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\1 — \2's album — reached the public \3 via the label \4."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\1, which \2 made, arrived \3 on the label \4."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) married ([^.]+)\."),
     [r"\1 entered into marriage with \2."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) wed ([^.]+)\."),
     [r"\1 took \2 as a spouse."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"\1's partner in marriage is \2."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"In marriage, \1 is joined to \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\1's life began in \2.",
      r"\2 is where \1 was born."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\1 originally comes from \2."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1's origins lie in \2."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\1 owes its existence to \2, its founder."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"Behind \1 stands \2, who started it."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"It was \1 who set \2 in motion."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\2 exists because \1 founded it."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"\1 tracks appear on it.",
      r"Its running order spans \1 tracks."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"\1 and \2 are husband and wife."]),
]

# ----------------------------------------------------------- bank d1
# DEV bank (round 5): authored fresh like a test bank, but explicitly
# sanctioned for inspection — the round-5 generalization loop measures
# ZERO-SHOT on each new dev bank before looking at its misses, so the
# zero-shot trend across d-banks is honest evidence that the general
# machinery transfers. Surfaces copy nothing from v1/v2/v3.
_E_D1 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"It was in the studio that \1 made the album \2.",
      r"\1 is responsible for recording the album \2."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"\2 provides the performance on the album \1.",
      r"As performer, \2 anchors the album \1."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"The \2 \1 bears \3's name.",
      r"\3 is the name on the \2 \1."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 placed it on the market in \1.",
      r"It entered circulation in \1 by way of the label \2."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"It hit stores in \1 courtesy of the label \2."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"In \1 the label \2 made it available."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"Its street date, set by the label \2, was \1."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"The label \2 circulated it starting \1."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"The album \1, put on the market \3 by the label \4, is \2's work."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\2's record \1 entered the catalog of the label \4 \3."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) married ([^.]+)\."),
     [r"\1 and \2 became a married couple."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) wed ([^.]+)\."),
     [r"The union of \1 and \2 was sealed in marriage."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"For a spouse, \1 has \2."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"The person married to \1 is \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\2 was the setting of \1's birth.",
      r"As for \1, the city of birth is \2."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"By birth, \1 belongs to \2."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1 calls \2 home."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\2 brought \1 into existence."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\1 traces back to \2, who started it."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"Credit for establishing \2 rests with \1."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"It is to \1 that \2 traces its founding."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"A total of \1 tracks fill it.",
      r"Its tracklist numbers \1."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"In wedlock, \1 is bound to \2."]),
]

_Q_D1 = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"carried by the label \1",
      r"that the label \1 has in its catalog"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"Which city welcomed \1 at birth?",
      r"State \1's city of birth."]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"The performer of \1 is who?"]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"Whose spouse is \1?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"The release of \1 dates to which year?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Which of the pair — \1 or \2 — predates the other?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"What number of \1"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"hold a larger tracklist than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"hold a smaller tracklist than"]),
    (re.compile(r"^"),
     [r"Looking at the material above: ",
      r"With these passages in hand, "]),
]

# ----------------------------------------------------------- bank v3
# Authored at ROUND-5 START (2026-08-20), before any round-5 solver work,
# per HELDOUT.md: the single v2 aggregate look at round-4 end makes v2
# semi-dev for round 5, so the end-of-round solver-blind claim needs this
# fresh bank. Measured ONCE at round-5 end; no solver patch may follow
# that measurement. Written as fluent-human paraphrases; copies no v1/v2
# replacement surface and aims neither at nor away from solver lemmas.
_E3 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"The recording of the album \2 is credited to \1.",
      r"Behind the album \2 stands \1, who recorded it."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"The artist heard on the album \1 is \2.",
      r"\1 is an album, and the performer on it is \2."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"The \2 \1 has \3 as its maker.",
      r"Credit for the \2 \1 goes to \3."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"Release came in \1, handled by the label \2.",
      r"The year \1 saw the label \2 issue it."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"Under the label \2, it surfaced in \1."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"It surfaced in \1 thanks to the label \2."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"The date of its release by the label \2 was \1."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"It reached listeners on \1, issued by the label \2."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"The label \4 put out \1, \2's album, \3."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"The label \4 released \1 \3; the record is by \2."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) married ([^.]+)\."),
     [r"A marriage joined \1 and \2."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) wed ([^.]+)\."),
     [r"\1 became \2's spouse."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"\2 and \1 are married to each other."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"\1 is wed to \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\1 first saw the light of day in \2.",
      r"The birth of \1 took place in \2."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\2 counts \1 among its natives."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1's roots are in \2."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"The founding of \1 was the work of \2."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\1 began as \2's venture."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"The establishment of \2 is owed to \1."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\1 is the founder of \2."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"It runs to \1 tracks.",
      r"Listeners get \1 tracks on it."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"\1 has \2 for a spouse."]),
]

_Q3 = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"put into circulation by the label \1",
      r"issued under the label \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"What is the city of birth of \1?",
      r"Identify the birth city of \1."]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"Which artist is heard on \1?"]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"Who did \1 marry?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"What year saw the release of \1?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Between \1 and \2, which appeared sooner?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"Give the number of \1:",
      r"State how many \1"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"run longer, in track count, than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"come up shorter in tracks than"]),
    (re.compile(r"^"),
     [r"From the passages provided: ",
      r"Working from these texts, "]),
]

_Q2 = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"brought out on the label \1",
      r"in the catalog of the label \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"Name the city where \1 was born.",
      r"\1 was born in what city?"]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"\1 was performed by whom?"]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"To whom is \1 married?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"In what year did \1 reach the public?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Of \1 and \2, which one came earlier?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"What is the total count of \1:",
      r"Tally the \1: how many"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"boast more tracks than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"fall short, in tracks, of"]),
    (re.compile(r"^"),
     [r"Per the text above: ",
      r"Drawing on the given paragraphs, "]),
]

# --------------------------------------------------------------- question
_Q = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"that the label \1 put out",
      r"released on \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"What city is the birthplace of \1?",
      r"Which city was \1 born in?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"In total, how many \1",
      r"Count the \1: how many"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"carry a greater number of tracks than",
      r"have a higher track count than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"carry a smaller number of tracks than"]),
    (re.compile(r"\balbum\b"),
     [r"LP", r"full-length release"]),
    (re.compile(r"^"),
     [r"According to these paragraphs, ",
      r"Based on the passages: "]),
]


# ----------------------------------------------------------- bank d2
# Second round-5 DEV bank (see d1 header): authored fresh 2026-08-20,
# zero-shot measured BEFORE inspecting any miss. Copies no surface from
# v1/v2/v3/d1.
_E_D2 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"The sessions for the album \2 were led by \1.",
      r"\1 laid down the album \2."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"On the album \1, the performing credit goes to \2.",
      r"\1 features \2 as its performer."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"The \2 \1 belongs to \3's discography.",
      r"\3's discography includes the \2 \1."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"Its release, through the label \2, happened in \1.",
      r"The label \2 pressed and released it during \1."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"Listeners first got it in \1 from the label \2."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"The label \2 delivered it to shops in \1."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 released it to the public on \1."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"Shipping began \1 under the label \2."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\1 arrived \3 on the label \4; the album is \2's."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\2 put \1 before the public \3, with the label \4 handling "
      r"release."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) married ([^.]+)\."),
     [r"\1 took \2 as a spouse."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) wed ([^.]+)\."),
     [r"Matrimony linked \1 and \2."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"\1's partner in marriage is \2."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"Marriage ties \1 to \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\2 is where \1's life began.",
      r"\1 entered life in \2."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\1 is originally from \2."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1's beginnings lie in \2."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\2 stands at the origin of \1."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\1 opened its doors under \2."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"The establishment of \2 happened under \1's hand."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\2 owes its founding to \1."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"The count of tracks stands at \1.",
      r"\1 tracks make up the album."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"\1 shares a marriage with \2."]),
]

_Q_D2 = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"brought out by the label \1",
      r"released through the label \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"\1 came into the world in which city?",
      r"Name the city where \1 was born."]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"Which act stands behind \1?"]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"\1 is married to whom?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"\1 reached the public in which year?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Out of \1 and \2, which has the earlier release date?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"What's the tally of \1"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"outstrip, in track count,"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"trail, in track count,"]),
    (re.compile(r"^"),
     [r"Taking the excerpts into account, ",
      r"On the strength of these documents, "]),
]

# ----------------------------------------------------------- bank d3
# Third round-5 DEV bank (see d1 header): authored fresh 2026-08-20
# after the d2 close, zero-shot measured BEFORE inspecting any miss.
# Copies no replacement surface from v1/v2/v3/d1/d2; several rules
# deliberately drop the "label"/"born" cue words entirely so the
# type-signature machinery (not cue lexicons) must orient the triple.
_E_D3 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"The album \2 was cut by \1 in the studio.",
      r"Recording duties on the album \2 fell to \1."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"The artist heard throughout \1 is \2.",
      r"\1 showcases a performance by \2."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"\1 is one of \3's \2s.",
      r"Among \3's \2s is \1."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"The year \1 saw its arrival via the label \2.",
      r"Release came in \1, with \2 as the issuing label."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"Under the label \2, it went public in \1."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"Copies went out to buyers in \1 under the label \2."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"Release day was \1, with the label \2 behind it."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"The label \2 sent it into the world on \1."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"Issued \3 on the label \4, \1 is \2's album.",
      r"\1 — \2's album — reached shelves \3 on the label \4."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"\1, which \2 made, went on sale \3 with the label \4 "
      r"handling distribution."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) married ([A-Z][\w' ]+?)"
                r" in (\d{4})\."),
     [r"\1 and \2 became spouses in \3."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) married ([^.]+)\."),
     [r"\1 and \2 became spouses.",
      r"\1 has \2 for a spouse."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) wed ([^.]+)\."),
     [r"In marriage, \1 is joined to \2."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"Married life pairs \1 with \2."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"\1 shares married life with \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\1's earliest years were spent in \2.",
      r"The record books list \2 as \1's birthplace."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\2 counts \1 among its natives."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1's story starts in \2."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\2 gave \1 its start.",
      r"\1 began as \2's venture."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\1 exists because \2 launched it."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"The founding papers of \2 bear \1's signature."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\2 was \1's creation."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"Running through it are \1 tracks.",
      r"Its track listing runs to \1 entries."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"\1 and \2 are wed to each other."]),
]

_Q_D3 = [
    (re.compile(r"\breleased on the label ([A-Z][\w' ]+)"),
     [r"put into circulation by the label \1",
      r"issued under the label \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"Which city does \1 originally hail from?",
      r"What city saw \1's earliest days?"]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"Whose performance is captured on \1?",
      r"Name the act credited on \1."]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"Who shares married life with \1?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"What year marks the release of \1?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Between \1 and \2, which predates the other in release?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"What figure gives the count of \1"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"run longer, track-wise, than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"come in under the track total of"]),
    (re.compile(r"^"),
     [r"Judging solely from the supplied text, ",
      r"With the cited excerpts as evidence: "]),
]

# ----------------------------------------------------------- bank d4
# Fourth round-5 DEV bank (see d1 header): authored fresh 2026-08-20
# after the d3 close, zero-shot measured BEFORE inspecting any miss.
# Deliberately leans on catalog/sleeve/household metonymy — surfaces
# where no cue lexicon can fire and the type-signature machinery must
# carry the triple.
_E_D4 = [
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) recorded the album ([^.]+)\."),
     [r"Studio work on the album \2 was handled by \1.",
      r"The album \2 took shape with \1 at the microphone."]),
    (re.compile(r"([^.]+?) is an album performed by ([^.]+)\."),
     [r"\1 carries \2's voice throughout.",
      r"Every track on \1 is sung by \2."]),
    (re.compile(r"([^.]+?) is an (album|record) by ([^.]+)\."),
     [r"\1 sits in \3's catalog.",
      r"\3's name appears on the sleeve of \1."]),
    (re.compile(r"It was released in ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 added it to its catalog in \1.",
      r"It joined the label \2's catalog in \1."]),
    (re.compile(r"It came out in ([^.]+?) on the label ([^.]+)\."),
     [r"Record shops first stocked it in \1, a release of the label \2."]),
    (re.compile(r"It was put out in ([^.]+?) by the label ([^.]+)\."),
     [r"In \1 the label \2 put it on record-store shelves."]),
    (re.compile(r"It was released on ([^.]+?) on the label ([^.]+)\."),
     [r"The label \2 set \1 as its release date."]),
    (re.compile(r"It came out on ([^.]+?) through the label ([^.]+)\."),
     [r"Its first day of sale, \1, came courtesy of the label \2."]),
    (re.compile(r"([^.]+?), an album by ([^.]+?), was released "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"Dated \3, the album \1 reached the public through the label \4; "
      r"\2 made it."]),
    (re.compile(r"([^.]+?), a record by ([^.]+?), came out "
                r"(in [^.]+?|on [^.]+?) on the label ([^.]+)\."),
     [r"The album \1 appeared \3 in the label \4's catalog, with \2 "
      r"credited."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) married ([A-Z][\w' ]+?)"
                r" in (\d{4})\."),
     [r"\1 and \2 swapped rings in \3.",
      r"A wedding in \3 made \1 and \2 a pair."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) married ([^.]+)\."),
     [r"\1 and \2 swapped rings.",
      r"A wedding made \1 and \2 a pair."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?)(?<! is)(?<! was)"
                r"(?<! are)(?<! were) wed ([^.]+)\."),
     [r"\1 and \2 share a household and a marriage."]),
    (re.compile(r"The spouse of ([^.]+?) is ([^.]+)\."),
     [r"\2 is \1's other half in marriage."]),
    (re.compile(r"([\w' ]+?)'s spouse is ([^.]+)\."),
     [r"At home, \1's other half is \2."]),
    (re.compile(r"([\w' ]+?) was born in ([^.]+)\."),
     [r"\2 appears on \1's birth record.",
      r"Life for \1 began in \2."]),
    (re.compile(r"([\w' ]+?) is a native of ([^.]+)\."),
     [r"\1 grew up on \2's streets."]),
    (re.compile(r"([\w' ]+?) hails from ([^.]+)\."),
     [r"\1's childhood unfolded in \2."]),
    (re.compile(r"([^.]+?) was founded by ([^.]+)\."),
     [r"\1 exists thanks to \2's founding work.",
      r"It was \2 who set \1 going."]),
    (re.compile(r"([^.]+?) was started by ([^.]+)\."),
     [r"\1 got going when \2 opened it."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) established ([^.]+)\."),
     [r"Setting up \2 was \1's doing."]),
    (re.compile(r"(?<![\w,]) ?([A-Z][\w' ]+?) founded ([^.]+)\."),
     [r"\2 has \1 to thank for its existence."]),
    (re.compile(r"It features ([\w-]+) tracks\."),
     [r"Play it end to end and you pass \1 tracks.",
      r"The sleeve lists \1 tracks."]),
    (re.compile(r"([\w' ]+?) is married to ([^.]+)\."),
     [r"Marriage links the household of \1 and \2."]),
]

_Q_D4 = [
    # entity capture is capitalized-words-only: a [\w' ]+ span swallows
    # trailing lowercase question words ("the label Mira Disc born") and
    # garbles the question into non-English
    (re.compile(r"\breleased on the label "
                r"([A-Z][\w']*(?: [A-Z0-9][\w']*)*)"),
     [r"added to the label \1's catalog",
      r"released with the label \1"]),
    (re.compile(r"\bIn which city was ([^?]+?) born\?"),
     [r"What city appears on \1's birth record?",
      r"Where did life begin for \1?"]),
    (re.compile(r"\bWho performed ([^?]+?)\?"),
     [r"Whose voice fills \1?",
      r"Who is heard singing on \1?"]),
    (re.compile(r"\bWho is the spouse of ([^?]+?)\?"),
     [r"Who is \1's other half in marriage?"]),
    (re.compile(r"\bWhen was ([^?]+?) released\?"),
     [r"In what year did \1 first reach record shops?"]),
    (re.compile(r"\bWhich was released first, ([^?]+?) or ([^?]+?)\?"),
     [r"Which of \1 and \2 was on shelves sooner?"]),
    (re.compile(r"\bHow many (albums|works|records|songs)\b"),
     [r"Count up the \1: how many"]),
    (re.compile(r"\bhave more tracks than\b"),
     [r"pack a longer tracklist than"]),
    (re.compile(r"\bhave fewer tracks than\b"),
     [r"offer a shorter tracklist than"]),
    (re.compile(r"^"),
     [r"Relying on nothing beyond these paragraphs, ",
      r"Reading only what is quoted above: "]),
]

_BANKS = {"v1": (_E, _Q), "v2": (_E2, _Q2), "v3": (_E3, _Q3),
          "d1": (_E_D1, _Q_D1), "d2": (_E_D2, _Q_D2),
          "d3": (_E_D3, _Q_D3), "d4": (_E_D4, _Q_D4)}


def _apply(text: str, rules, rng, p: float) -> str:
    for pat, reps in rules:
        if rng.random() >= p:
            continue
        rep = reps[int(rng.integers(0, len(reps)))]
        text = pat.sub(rep, text)
    return text


def paraphrase_item(item: dict, rng, p_evidence: float = 0.8,
                    p_question: float = 0.6, bank: str = "v1") -> dict:
    e_rules, q_rules = _BANKS[bank]
    out = dict(item)
    q = _apply(item["question"], q_rules, rng, p_question)
    # keep the leading capital sane after a prepend rule fires
    out["question"] = q[0].upper() + q[1:] if q else q
    paras = []
    for para in item["paragraphs"]:
        np_ = dict(para)
        np_["paragraph_text"] = _apply(
            para["paragraph_text"], e_rules, rng, p_evidence)
        paras.append(np_)
    out["paragraphs"] = paras
    out["id"] = item["id"].replace("synth_", "heldout_")
    return out


def make_heldout(n: int, distractors: int, seed: int,
                 p_evidence: float = 0.8, p_question: float = 0.6,
                 bank: str = "v1"):
    from gen_synth_musique import make_items
    rng = np.random.default_rng(seed + 104729)   # distinct stream
    return [paraphrase_item(it, rng, p_evidence, p_question, bank)
            for it in make_items(n, distractors=distractors, seed=seed)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=188)
    ap.add_argument("--distractors", type=int, default=4)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--p-evidence", type=float, default=0.8)
    ap.add_argument("--p-question", type=float, default=0.6)
    ap.add_argument("--bank", choices=sorted(_BANKS), default="v1")
    args = ap.parse_args()
    items = make_heldout(args.n, args.distractors, args.seed,
                         args.p_evidence, args.p_question, args.bank)
    with open(args.out, "w") as fh:
        for it in items:
            fh.write(json.dumps(it) + "\n")
    changed_q = sum(1 for a, b in zip(
        items, make_heldout(args.n, args.distractors, args.seed, 0.0, 0.0))
        if a["question"] != b["question"])
    print(f"wrote {len(items)} items to {args.out} "
          f"({changed_q} questions rewritten)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
