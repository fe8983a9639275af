"""Vendored multi-part public-suffix snapshot — the LARGE table behind
the ``registered_domain`` / ``registered_domain_join`` PSL seam.

:data:`PSL_ICANN_FULL` is a literal-entry snapshot of the Mozilla
Public Suffix List's ICANN section, hand-vendored from public
knowledge of the list (single-label TLDs need no entry — "last two
labels" is already the default rule; wildcard ``*.x`` and exception
``!y.x`` rules are NOT representable here and are rejected loudly by
``_split_by_depth``, see its docstring — the handful of wildcard TLDs
are approximated below by their conventional literal second levels,
the same expansion most offline resolvers ship). Regenerate from the
upstream list for production freshness; the shape (a flat tuple of
2- and 3-label literal suffixes) is exactly what both spellings of the
rule consume, so a fresh dump drops in with no code change.

This is a SUPERSET of ``urls.PUBLIC_SUFFIXES`` (asserted by test):
existing contracts keep the small table as their pinned source of
truth; :data:`PSL_ICANN_FULL` feeds the join spelling at scale and the
``url_psl_domains`` contract, which exercises suffixes absent from the
small table (``com.bo``, ``tokyo.jp``, ``bc.ca``, ``wa.us`` …).
"""

from __future__ import annotations

from .urls import PUBLIC_SUFFIXES

__all__ = ["PSL_ICANN_FULL", "PSL_RULES", "PSL_ICANN_FULL_RULES"]

# --- ccTLD second-level registrations (2-label literal entries) -------
_CC_SECOND_LEVEL = {
    # Africa
    "ao": ("co", "ed", "gv", "it", "og", "pb"),
    "bf": ("gov",),
    "bw": ("co", "org"),
    "ci": ("ac", "asso", "co", "com", "ed", "edu", "go", "gouv", "int",
           "net", "or", "org"),
    "cm": ("co", "com", "gov", "net"),
    "dz": ("art", "asso", "com", "edu", "gov", "net", "org", "pol",
           "soc", "tm"),
    "eg": ("com", "edu", "eun", "gov", "mil", "name", "net", "org",
           "sci", "sport"),
    "et": ("biz", "com", "edu", "gov", "info", "name", "net", "org"),
    "gh": ("com", "edu", "gov", "mil", "org"),
    "ke": ("ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"),
    "lr": ("com", "edu", "gov", "net", "org"),
    "ls": ("ac", "biz", "co", "edu", "gov", "info", "net", "org", "sc"),
    "ma": ("ac", "co", "gov", "net", "org", "press"),
    "mg": ("co", "com", "edu", "gov", "mil", "nom", "org", "prd", "tm"),
    "ml": ("com", "edu", "gouv", "gov", "net", "org", "presse"),
    "mr": ("gov",),
    "mu": ("ac", "co", "com", "gov", "net", "or", "org"),
    "mw": ("ac", "biz", "co", "com", "coop", "edu", "gov", "int",
           "museum", "net", "org"),
    "mz": ("ac", "adv", "co", "edu", "gov", "mil", "net", "org"),
    "na": ("ca", "cc", "co", "com", "dr", "in", "info", "mobi", "mx",
           "name", "or", "org", "pro", "school", "tv", "us", "ws"),
    "ng": ("com", "edu", "gov", "i", "mil", "mobi", "name", "net",
           "org", "sch"),
    "rw": ("ac", "co", "coop", "gov", "mil", "net", "org"),
    "sc": ("com", "edu", "gov", "net", "org"),
    "sd": ("com", "edu", "gov", "info", "med", "net", "org", "tv"),
    "sh": ("com", "gov", "mil", "net", "org"),
    "sl": ("com", "edu", "gov", "net", "org"),
    "sn": ("art", "com", "edu", "gouv", "org", "perso", "univ"),
    "so": ("com", "edu", "gov", "me", "net", "org"),
    "ss": ("biz", "com", "edu", "gov", "me", "net", "org", "sch"),
    "sz": ("ac", "co", "org"),
    "tn": ("com", "ens", "fin", "gov", "ind", "info", "intl", "nat",
           "net", "org", "perso", "tourism"),
    "tz": ("ac", "co", "go", "hotel", "info", "me", "mil", "mobi",
           "ne", "or", "sc", "tv"),
    "ug": ("ac", "co", "com", "go", "ne", "or", "org", "sc"),
    "za": ("ac", "edu", "gov", "law", "mil", "net", "nom", "org",
           "school", "web"),
    "zm": ("ac", "biz", "co", "com", "edu", "gov", "info", "mil",
           "net", "org", "sch"),
    "zw": ("ac", "co", "gov", "mil", "org"),
    # Americas
    "ar": ("com", "edu", "gob", "gov", "int", "mil", "net", "org",
           "tur"),
    "bb": ("biz", "co", "com", "edu", "gov", "info", "net", "org",
           "store", "tv"),
    "bo": ("com", "edu", "gob", "int", "mil", "net", "org", "tv",
           "web"),
    "br": ("adv", "agr", "am", "arq", "art", "ato", "bio", "blog",
           "bmd", "cim", "cng", "cnt", "com", "coop", "ecn", "eco",
           "edu", "emp", "eng", "esp", "etc", "eti", "far", "flog",
           "fm", "fnd", "fot", "fst", "g12", "ggf", "gov", "imb",
           "ind", "inf", "jor", "jus", "leg", "lel", "mat", "med",
           "mil", "mp", "mus", "net", "not", "ntr", "odo", "org",
           "ppg", "pro", "psc", "psi", "qsl", "radio", "rec", "slg",
           "srv", "taxi", "teo", "tmp", "trd", "tur", "tv", "vet",
           "vlog", "wiki", "zlg"),
    "bs": ("com", "edu", "gov", "net", "org"),
    "bz": ("com", "edu", "gov", "net", "org"),
    "ca": ("ab", "bc", "gc", "mb", "nb", "nf", "nl", "ns", "nt", "nu",
           "on", "pe", "qc", "sk", "yk"),
    "cl": ("co", "gob", "gov", "mil"),
    "co": ("arts", "com", "edu", "firm", "gov", "info", "int", "mil",
           "net", "nom", "org", "rec", "web"),
    "cr": ("ac", "co", "ed", "fi", "go", "or", "sa"),
    "cu": ("com", "edu", "gov", "inf", "net", "org"),
    "do": ("art", "com", "edu", "gob", "gov", "mil", "net", "org",
           "sld", "web"),
    "ec": ("com", "edu", "fin", "gob", "gov", "info", "k12", "med",
           "mil", "net", "org", "pro"),
    "gt": ("com", "edu", "gob", "ind", "mil", "net", "org"),
    "gy": ("co", "com", "edu", "gov", "net", "org"),
    "hn": ("com", "edu", "gob", "mil", "net", "org"),
    "ht": ("adult", "art", "asso", "com", "coop", "edu", "firm",
           "gouv", "info", "med", "net", "org", "perso", "pol", "pro",
           "rel", "shop"),
    "ky": ("com", "edu", "net", "org"),
    "lc": ("co", "com", "edu", "gov", "net", "org"),
    "mx": ("com", "edu", "gob", "net", "org"),
    "ms": ("com", "edu", "gov", "net", "org"),
    "ni": ("ac", "biz", "co", "com", "edu", "gob", "in", "info",
           "int", "mil", "net", "nom", "org", "web"),
    "pa": ("abo", "ac", "com", "edu", "gob", "ing", "med", "net",
           "nom", "org", "sld"),
    "pe": ("com", "edu", "gob", "mil", "net", "nom", "org"),
    "pr": ("ac", "biz", "com", "edu", "est", "gov", "info", "isla",
           "name", "net", "org", "pro", "prof"),
    "py": ("com", "coop", "edu", "gov", "mil", "net", "org"),
    "sv": ("com", "edu", "gob", "org", "red"),
    "tt": ("aero", "biz", "co", "com", "coop", "edu", "gov", "info",
           "int", "jobs", "mobi", "museum", "name", "net", "org",
           "pro", "travel"),
    "uy": ("com", "edu", "gub", "mil", "net", "org"),
    "vc": ("com", "edu", "gov", "mil", "net", "org"),
    "ve": ("arts", "bib", "co", "com", "e12", "edu", "firm", "gob",
           "gov", "info", "int", "mil", "net", "nom", "org", "rec",
           "store", "tec", "web"),
    "vi": ("co", "com", "k12", "net", "org"),
    # Asia / Middle East
    "af": ("com", "edu", "gov", "net", "org"),
    "az": ("biz", "com", "edu", "gov", "info", "int", "mil", "name",
           "net", "org", "pp", "pro"),
    "bd": ("ac", "com", "edu", "gov", "mil", "net", "org"),
    "bh": ("com", "edu", "gov", "net", "org"),
    "bn": ("com", "edu", "gov", "net", "org"),
    "bt": ("com", "edu", "gov", "net", "org"),
    "cn": ("ac", "ah", "bj", "com", "cq", "edu", "fj", "gd", "gov",
           "gs", "gx", "gz", "ha", "hb", "he", "hi", "hk", "hl", "hn",
           "jl", "js", "jx", "ln", "mil", "mo", "net", "nm", "nx",
           "org", "qh", "sc", "sd", "sh", "sn", "sx", "tj", "tw",
           "xj", "xz", "yn", "zj"),
    "hk": ("com", "edu", "gov", "idv", "net", "org"),
    "id": ("ac", "biz", "co", "desa", "go", "mil", "my", "net", "or",
           "ponpes", "sch", "web"),
    "il": ("ac", "co", "gov", "idf", "k12", "muni", "net", "org"),
    "in": ("ac", "co", "edu", "firm", "gen", "gov", "ind", "mil",
           "net", "nic", "org", "res"),
    "iq": ("com", "edu", "gov", "mil", "net", "org"),
    "ir": ("ac", "co", "gov", "id", "net", "org", "sch"),
    "jo": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "jp": ("ac", "ad", "aichi", "akita", "aomori", "chiba", "co",
           "ed", "ehime", "fukui", "fukuoka", "fukushima", "gifu",
           "go", "gr", "gunma", "hiroshima", "hokkaido", "hyogo",
           "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima",
           "kanagawa", "kochi", "kumamoto", "kyoto", "lg", "mie",
           "miyagi", "miyazaki", "nagano", "nagasaki", "nara", "ne",
           "niigata", "oita", "okayama", "okinawa", "or", "osaka",
           "saga", "saitama", "shiga", "shimane", "shizuoka",
           "tochigi", "tokushima", "tokyo", "tottori", "toyama",
           "wakayama", "yamagata", "yamaguchi", "yamanashi"),
    "kg": ("com", "edu", "gov", "mil", "net", "org"),
    "kh": ("com", "edu", "gov", "mil", "net", "org", "per"),
    "kr": ("ac", "busan", "chungbuk", "chungnam", "co", "daegu",
           "daejeon", "es", "gangwon", "go", "gwangju", "gyeongbuk",
           "gyeonggi", "gyeongnam", "hs", "incheon", "jeju",
           "jeonbuk", "jeonnam", "kg", "mil", "ms", "ne", "or", "pe",
           "re", "sc", "seoul", "ulsan"),
    "kw": ("com", "edu", "emb", "gov", "ind", "net", "org"),
    "kz": ("com", "edu", "gov", "mil", "net", "org"),
    "la": ("com", "edu", "gov", "info", "int", "net", "org", "per"),
    "lb": ("com", "edu", "gov", "net", "org"),
    "lk": ("ac", "assn", "com", "edu", "gov", "grp", "hotel", "int",
           "ltd", "net", "ngo", "org", "sch", "soc", "web"),
    "mn": ("edu", "gov", "org"),
    "mo": ("com", "edu", "gov", "net", "org"),
    "mv": ("aero", "biz", "com", "coop", "edu", "gov", "info", "int",
           "mil", "museum", "name", "net", "org", "pro"),
    "my": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "np": ("com", "edu", "gov", "mil", "net", "org"),
    "om": ("co", "com", "edu", "gov", "med", "museum", "net", "org",
           "pro"),
    "ph": ("com", "edu", "gov", "i", "mil", "net", "ngo", "org"),
    "pk": ("biz", "com", "edu", "fam", "gob", "gok", "gon", "gop",
           "gos", "gov", "net", "org", "web"),
    "ps": ("com", "edu", "gov", "net", "org", "plo", "sec"),
    "qa": ("com", "edu", "gov", "mil", "name", "net", "org", "sch"),
    "sa": ("com", "edu", "gov", "med", "net", "org", "pub", "sch"),
    "sb": ("com", "edu", "gov", "net", "org"),
    "sg": ("com", "edu", "gov", "net", "org"),
    "sy": ("com", "edu", "gov", "mil", "net", "org"),
    "th": ("ac", "co", "go", "in", "mi", "net", "or"),
    "tj": ("ac", "biz", "co", "com", "edu", "go", "gov", "int", "mil",
           "name", "net", "nic", "org", "test", "web"),
    "tm": ("co", "com", "edu", "gov", "mil", "net", "nom", "org"),
    "tw": ("club", "com", "ebiz", "edu", "game", "gov", "idv", "mil",
           "net", "org"),
    "uz": ("co", "com", "net", "org"),
    "vn": ("ac", "biz", "com", "edu", "gov", "health", "info", "int",
           "name", "net", "org", "pro"),
    "ye": ("com", "edu", "gov", "mil", "net", "org"),
    # Europe / CIS
    "at": ("ac", "co", "gv", "or"),
    "ba": ("com", "edu", "gov", "mil", "net", "org"),
    "be": ("ac",),
    "by": ("com", "gov", "mil", "of"),
    "cy": ("ac", "biz", "com", "ekloges", "gov", "ltd", "net", "org",
           "press", "tm"),
    "ee": ("aip", "com", "edu", "fie", "gov", "lib", "med", "org",
           "pri", "riik"),
    "es": ("com", "edu", "gob", "nom", "org"),
    "fi": ("aland",),
    "fr": ("asso", "com", "gouv", "nom", "prd", "tm"),
    "ge": ("com", "edu", "gov", "mil", "net", "org", "pvt"),
    "gg": ("co", "net", "org"),
    "gi": ("com", "edu", "gov", "ltd", "mod", "org"),
    "gr": ("com", "edu", "gov", "net", "org"),
    "hr": ("com", "from", "iz", "name"),
    "hu": ("2000", "agrar", "bolt", "city", "co", "film", "forum",
           "games", "hotel", "info", "ingatlan", "lakas", "media",
           "news", "org", "priv", "reklam", "shop", "sport", "suli",
           "tm", "tozsde", "utazas", "video"),
    "ie": ("gov",),
    "im": ("ac", "co", "com", "net", "org", "tt", "tv"),
    "is": ("com", "edu", "gov", "int", "net", "org"),
    "it": ("edu", "gov"),
    "je": ("co", "net", "org"),
    "lt": ("gov",),
    "lv": ("asn", "com", "conf", "edu", "gov", "id", "mil", "net",
           "org"),
    "mc": ("asso", "tm"),
    "md": ("gov",),
    "me": ("ac", "co", "edu", "gov", "its", "net", "org", "priv"),
    "mk": ("com", "edu", "gov", "inf", "name", "net", "org"),
    "mt": ("com", "edu", "net", "org"),
    "no": ("dep", "fhs", "folkebibl", "fylkesbibl", "herad", "idrett",
           "kommune", "mil", "museum", "priv", "stat", "vgs"),
    "pl": ("art", "biz", "com", "edu", "gov", "info", "mil", "net",
           "org", "waw", "warszawa", "wroc", "wroclaw", "krakow",
           "poznan", "lodz", "gda", "gdansk", "szczecin", "slupsk"),
    "pt": ("com", "edu", "gov", "int", "net", "nome", "org", "publ"),
    "ro": ("arts", "com", "firm", "info", "nom", "nt", "org", "rec",
           "store", "tm", "www"),
    "rs": ("ac", "co", "edu", "gov", "in", "org"),
    "ru": ("ac", "edu", "gov", "int", "mil"),
    "se": ("ac", "org", "pp", "press", "tm"),
    "tr": ("av", "bbs", "bel", "biz", "com", "dr", "edu", "gen",
           "gov", "info", "k12", "kep", "name", "net", "org", "pol",
           "tel", "tsk", "tv", "web"),
    "ua": ("com", "crimea", "donetsk", "edu", "gov", "in", "kharkov",
           "kiev", "kyiv", "lviv", "net", "odessa", "org"),
    # Oceania
    "au": ("asn", "com", "conf", "edu", "gov", "id", "info", "net",
           "org", "oz"),
    "fj": ("ac", "biz", "com", "gov", "info", "mil", "name", "net",
           "org", "pro"),
    "gu": ("com", "edu", "gov", "guam", "info", "net", "org", "web"),
    "ki": ("biz", "com", "edu", "gov", "info", "net", "org"),
    "nc": ("asso", "nom"),
    "nf": ("arts", "com", "firm", "info", "net", "other", "per",
           "rec", "store", "web"),
    "nr": ("biz", "com", "edu", "gov", "info", "net", "org"),
    "nz": ("ac", "co", "cri", "geek", "gen", "govt", "health", "iwi",
           "kiwi", "maori", "mil", "net", "org", "parliament",
           "school"),
    "pf": ("com", "edu", "org"),
    "pn": ("co", "edu", "gov", "net", "org"),
    "sx": ("gov",),
    "to": ("com", "edu", "gov", "mil", "net", "org"),
    "vu": ("com", "edu", "net", "org"),
    "ws": ("com", "edu", "gov", "net", "org"),
    # US locality scheme: the 50 states + DC as 2-label entries (the
    # 3-label k12/cc/lib entries are generated below)
    "us": ("ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de",
           "dni", "fed", "fl", "ga", "hi", "ia", "id", "il", "in",
           "isa", "kids", "ks", "ky", "la", "ma", "md", "me", "mi",
           "mn", "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj",
           "nm", "nsn", "nv", "ny", "oh", "ok", "or", "pa", "ri",
           "sc", "sd", "tn", "tx", "ut", "va", "vt", "wa", "wi",
           "wv", "wy"),
}

_US_STATES = ("ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de",
              "fl", "ga", "hi", "ia", "id", "il", "in", "ks", "ky",
              "la", "ma", "md", "me", "mi", "mn", "mo", "ms", "mt",
              "nc", "nd", "ne", "nh", "nj", "nm", "nv", "ny", "oh",
              "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut",
              "va", "vt", "wa", "wi", "wv", "wy")

# 3-label entries: the US locality scheme's per-state k12 / cc / lib
# trees, plus the Australian state education suffixes already in the
# small table.
_THREE_LABEL = tuple(
    f"{tree}.{st}.us" for st in _US_STATES for tree in ("k12", "cc",
                                                        "lib")
) + ("act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au",
     "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au")

PSL_ICANN_FULL = tuple(sorted(
    set(PUBLIC_SUFFIXES)
    | {f"{sl}.{cc}" for cc, sls in _CC_SECOND_LEVEL.items()
       for sl in sls}
    | set(_THREE_LABEL)))

# --- wildcard / exception rules (round 12) -----------------------------
# The ICANN section's non-literal rules, vendored from public knowledge
# of the list: ``*.x`` = "every direct child of x is a public suffix"
# (so a registrable name under a wildcard TLD has THREE labels), and
# ``!y.x`` = "y.x is registrable after all" (the exception overrides its
# wildcard; PSL semantics: an exception rule beats every other matching
# rule). Only ``registered_domain_join`` understands these — the
# expression spelling (``registered_domain``) keeps its loud raise, see
# ``_split_by_depth``.
_WILDCARD_TLDS = ("bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg")
_JP_CITY_WILDCARDS = ("kawasaki.jp", "kitakyushu.jp", "kobe.jp",
                      "nagoya.jp", "sapporo.jp", "sendai.jp",
                      "yokohama.jp")
PSL_RULES = tuple(sorted(
    {f"*.{t}" for t in _WILDCARD_TLDS}
    | {"!www.ck", "*.sch.uk"}
    | {f"*.{c}" for c in _JP_CITY_WILDCARDS}
    | {f"!city.{c}" for c in _JP_CITY_WILDCARDS}))

#: the literal snapshot plus the rule entries — what the join spelling
#: consumes for full-PSL behavior (the wildcard-TLD literal
#: approximations in PSL_ICANN_FULL stay harmless next to the real
#: wildcard rules: both yield the same public-suffix depth).
PSL_ICANN_FULL_RULES = tuple(sorted(set(PSL_ICANN_FULL) | set(PSL_RULES)))
