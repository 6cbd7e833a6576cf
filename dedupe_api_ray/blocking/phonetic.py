"""Double Metaphone (Lawrence Philips, C/C++ Users Journal 2000 —
public-domain algorithm).  The reference's phonetic predicates key on
the doublemetaphone C extension †(dedupe:dedupe/predicates.py);
this is a from-scratch transcription of the published rules so the
predicate emits the same (primary, secondary) codes.

Returns (primary, secondary) uppercase codes truncated to
``max_length`` (4, the algorithm's default); secondary == primary is
collapsed to '' the way the common bindings do.
"""

from __future__ import annotations

_VOWELS = frozenset("AEIOUY")


def _is_slavo_germanic(s: str) -> bool:
    return ("W" in s) or ("K" in s) or ("CZ" in s) or ("WITZ" in s)


def double_metaphone(value: str, max_length: int = 4) -> tuple[str, str]:
    s = "".join(c for c in (value or "").upper() if "A" <= c <= "Z")
    if not s:
        return ("", "")
    length = len(s)
    last = length - 1
    slavo = _is_slavo_germanic(s)
    pri: list[str] = []
    sec: list[str] = []

    def at(start: int, *subs: str) -> bool:
        for sub in subs:
            if s[start:start + len(sub)] == sub:
                return True
        return False

    def ch(i: int) -> str:
        return s[i] if 0 <= i < length else ""

    def add(p: str, q: str | None = None) -> None:
        pri.append(p)
        sec.append(p if q is None else q)

    i = 0
    # silent initial letters
    if at(0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    if ch(0) == "X":  # initial X pronounced Z → S
        add("S")
        i = 1

    while i < length and (len("".join(pri)) < max_length
                          or len("".join(sec)) < max_length):
        c = s[i]
        if c in _VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if ch(i + 1) == "B" else 1
        elif c == "C":
            # germanic CH cases like 'mACHer'
            if i > 1 and ch(i - 2) not in _VOWELS and at(i - 1, "ACH") \
                    and ch(i + 2) != "I" \
                    and (ch(i + 2) != "E" or at(i - 2, "BACHER", "MACHER")):
                add("K")
                i += 2
            elif i == 0 and at(i, "CAESAR"):
                add("S")
                i += 2
            elif at(i, "CHIA"):
                add("K")
                i += 2
            elif at(i, "CH"):
                if i > 0 and at(i, "CHAE"):
                    add("K", "X")
                elif i == 0 and (at(i + 1, "HARAC", "HARIS")
                                 or at(i + 1, "HOR", "HYM", "HIA", "HEM")) \
                        and not at(0, "CHORE"):
                    add("K")
                elif at(0, "VAN ", "VON ") or at(0, "SCH") \
                        or at(i - 2, "ORCHES", "ARCHIT", "ORCHID") \
                        or at(i + 2, "T", "S") \
                        or ((i == 0 or ch(i - 1) in "AOUE")
                            and (ch(i + 2) in "LRNMBHFVW " or i + 2 >= length)):
                    add("K")
                else:
                    if i > 0:
                        if at(0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif at(i, "CZ") and not at(i - 2, "WICZ"):
                add("S", "X")
                i += 2
            elif at(i + 1, "CIA"):
                add("X")
                i += 3
            elif at(i, "CC") and not (i == 1 and ch(0) == "M"):
                if ch(i + 2) in "IEH" and not at(i + 2, "HU"):
                    if (i == 1 and ch(i - 1) == "A") \
                            or at(i - 1, "UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif at(i, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif at(i, "CI", "CE", "CY"):
                if at(i, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if at(i + 1, " C", " Q", " G"):
                    i += 3
                elif ch(i + 1) in "CKQ" and not at(i + 1, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if at(i, "DG"):
                if ch(i + 2) in "IEY":
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
            elif at(i, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if ch(i + 1) == "F" else 1
        elif c == "G":
            if ch(i + 1) == "H":
                if i > 0 and ch(i - 1) not in _VOWELS:
                    add("K")
                elif i == 0:
                    if ch(i + 2) == "I":
                        add("J")
                    else:
                        add("K")
                elif (i > 1 and ch(i - 2) in "BHD") \
                        or (i > 2 and ch(i - 3) in "BHD") \
                        or (i > 3 and ch(i - 4) in "BH"):
                    pass  # silent GH ('hugh', 'bought')
                else:
                    if i > 2 and ch(i - 1) == "U" and ch(i - 3) in "CGLRT":
                        add("F")  # 'laugh', 'cough'
                    elif i > 0 and ch(i - 1) != "I":
                        add("K")
                i += 2
            elif ch(i + 1) == "N":
                if i == 1 and ch(0) in _VOWELS and not slavo:
                    add("KN", "N")
                elif not at(i + 2, "EY") and ch(i + 1) != "Y" and not slavo:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif at(i + 1, "LI") and not slavo:
                add("KL", "L")
                i += 2
            elif i == 0 and (ch(i + 1) == "Y"
                             or at(i + 1, "ES", "EP", "EB", "EL", "EY", "IB",
                                   "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
            elif (at(i + 1, "ER") or ch(i + 1) == "Y") \
                    and not at(0, "DANGER", "RANGER", "MANGER") \
                    and ch(i - 1) not in "EI" \
                    and not at(i - 1, "RGY", "OGY"):
                add("K", "J")
                i += 2
            elif ch(i + 1) in "EIY" or at(i - 1, "AGGI", "OGGI"):
                if at(0, "VAN ", "VON ") or at(0, "SCH") or at(i + 1, "ET"):
                    add("K")
                elif at(i + 1, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if ch(i + 1) == "G" else 1
        elif c == "H":
            # only keep H between vowels or after silent-start handling
            if (i == 0 or ch(i - 1) in _VOWELS) and ch(i + 1) in _VOWELS:
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if at(i, "JOSE") or at(0, "SAN "):
                if (i == 0 and (ch(i + 4) == " " or length == 4)) \
                        or at(0, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
            elif i == 0 and not at(i, "JOSE"):
                add("J", "A")
                i += 2 if ch(i + 1) == "J" else 1
            elif ch(i - 1) in _VOWELS and not slavo and ch(i + 1) in "AO":
                add("J", "H")
                i += 1
            elif i == last:
                add("J", "")
                i += 1
            elif ch(i + 1) not in "LTKSNMBZ" and ch(i - 1) not in "SKL":
                add("J")
                i += 2 if ch(i + 1) == "J" else 1
            else:
                i += 2 if ch(i + 1) == "J" else 1
        elif c == "K":
            add("K")
            i += 2 if ch(i + 1) == "K" else 1
        elif c == "L":
            if ch(i + 1) == "L":
                # spanish 'cabrillo', 'gallegos'
                if (i == length - 3 and at(i - 1, "ILLO", "ILLA", "ALLE")) \
                        or ((at(last - 1, "AS", "OS") or ch(last) in "AO")
                            and at(i - 1, "ALLE")):
                    add("L", "")
                    i += 2
                    continue
                add("L")
                i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if (at(i - 1, "UMB") and (i + 1 == last or at(i + 2, "ER"))) \
                    or ch(i + 1) == "M":
                i += 2
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if ch(i + 1) == "N" else 1
        elif c == "P":
            if ch(i + 1) == "H":
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if ch(i + 1) in "PB" else 1
        elif c == "Q":
            add("K")
            i += 2 if ch(i + 1) == "Q" else 1
        elif c == "R":
            # french 'rogier', skip trailing R in secondary
            if i == last and not slavo and at(i - 2, "IE") \
                    and not at(i - 4, "ME", "MA"):
                add("", "R")
            else:
                add("R")
            i += 2 if ch(i + 1) == "R" else 1
        elif c == "S":
            if at(i - 1, "ISL", "YSL"):  # silent: 'isle', 'carlysle'
                i += 1
            elif i == 0 and at(i, "SUGAR"):
                add("X", "S")
                i += 1
            elif at(i, "SH"):
                if at(i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
            elif at(i, "SIO", "SIA") or at(i, "SIAN"):
                if slavo:
                    add("S")
                else:
                    add("S", "X")
                i += 3
            elif (i == 0 and ch(i + 1) in "MNLW") or ch(i + 1) == "Z":
                add("S", "X")
                i += 2 if ch(i + 1) == "Z" else 1
            elif at(i, "SC"):
                if ch(i + 2) == "H":
                    if at(i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if at(i + 3, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and ch(3) not in _VOWELS and ch(3) != "W":
                            add("X", "S")
                        else:
                            add("X")
                elif ch(i + 2) in "IEY":
                    add("S")
                else:
                    add("SK")
                i += 3
            elif i == last and at(i - 2, "AI", "OI"):
                add("", "S")  # french 'resnais', 'artois'
                i += 1
            else:
                add("S")
                i += 2 if ch(i + 1) in "SZ" else 1
        elif c == "T":
            if at(i, "TION") or at(i, "TIA", "TCH"):
                add("X")
                i += 3
            elif at(i, "TH") or at(i, "TTH"):
                if at(i + 2, "OM", "AM") or at(0, "VAN ", "VON ") \
                        or at(0, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if ch(i + 1) in "TD" else 1
        elif c == "V":
            add("F")
            i += 2 if ch(i + 1) == "V" else 1
        elif c == "W":
            if at(i, "WR"):
                add("R")
                i += 2
            elif i == 0 and (ch(i + 1) in _VOWELS or at(i, "WH")):
                if ch(i + 1) in _VOWELS:
                    add("A", "F")
                else:
                    add("A")
                i += 1
            elif (i == last and ch(i - 1) in _VOWELS) \
                    or at(i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
                    or at(0, "SCH"):
                add("", "F")
                i += 1
            elif at(i, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
            else:
                i += 1
        elif c == "X":
            if not (i == last and (at(i - 3, "IAU", "EAU")
                                   or at(i - 2, "AU", "OU"))):
                add("KS")
            i += 2 if ch(i + 1) in "CX" else 1
        elif c == "Z":
            if ch(i + 1) == "H":
                add("J")
                i += 2
            else:
                if at(i + 1, "ZO", "ZI", "ZA") \
                        or (slavo and i > 0 and ch(i - 1) != "T"):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if ch(i + 1) == "Z" else 1
        else:
            i += 1

    p = "".join(pri)[:max_length]
    q = "".join(sec)[:max_length]
    return (p, "" if q == p else q)
