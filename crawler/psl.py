"""Curated public-suffix-list snapshot (public data: publicsuffix.org).

The reference derives topPrivateDomain from Guava's
InternetDomainName.topPrivateDomain() (Requests.scala:50-53), which
embeds the full Mozilla Public Suffix List.  This module vendors a
curated snapshot of that list's high-traffic rules — every ISO-3166
ccTLD, the major gTLDs, the common ccTLD second-level registration
suffixes (co.uk, com.au, co.jp, ...), and the widely-used PRIVATE
section suffixes (github.io, blogspot.com, herokuapp.com, ...) — in the
exact rule shape the full list uses, so swapping in a complete
publicsuffix.org dump is a data-only change (extend these frozensets).

FULL PSL rule semantics (publicsuffix.org/list/), implemented by
crawler.urlnorm.tpd_expr / _tpd_one over the structures below:
  - exact rules at any depth ('com', 'co.uk', 'k12.ma.us',
    'pvt.k12.ma.us', 's3.dualstack.us-east-1.amazonaws.com')
  - wildcard rules '*.<base>' ('*.ck', '*.kawasaki.jp'): every direct
    child of <base> is a public suffix
  - exception rules '!<host>' ('!www.ck', '!city.kawasaki.jp'): the
    named host is NOT a public suffix — it is itself the registered
    domain (PSL: "prevailing exception rule, leftmost label removed")
  - among matching rules the LONGEST (deepest) wins; registered domain
    (eTLD+1, Guava topPrivateDomain) = prevailing suffix + one label
  - a host whose last label is not a known TLD is not under any public
    suffix → 'notpd' (Guava isUnderPublicSuffix() == false); a host
    that IS a public suffix (e.g. 'bar.ck' under '*.ck') → 'notpd'

Scale shape: per-depth membership tests compile to Catalyst InSet
(hash lookup) via Column.isin — O(1) per row regardless of list size,
JVM-side; depth count (≤5) bounds the CASE branches, not the data.
"""

from __future__ import annotations

#: every ISO-3166-1 alpha-2 ccTLD + the major gTLDs.  A host whose TLD
#: is absent here is treated as not under a public suffix (localhost,
#: .internal, .local, bare intranet names) → tpd 'notpd'.
_CCTLDS = """
ac ad ae af ag ai al am ao aq ar as at au aw ax az
ba bb bd be bf bg bh bi bj bm bn bo br bs bt bw by bz
ca cc cd cf cg ch ci ck cl cm cn co cr cu cv cw cx cy cz
de dj dk dm do dz ec ee eg er es et eu fi fj fk fm fo fr
ga gd ge gf gg gh gi gl gm gn gp gq gr gs gt gu gw gy
hk hm hn hr ht hu id ie il im in io iq ir is it
je jm jo jp ke kg kh ki km kn kp kr kw ky kz
la lb lc li lk lr ls lt lu lv ly ma mc md me mg mh mk ml mm mn mo
mp mq mr ms mt mu mv mw mx my mz
na nc ne nf ng ni nl no np nr nu nz om pa pe pf pg ph pk pl pm pn pr
ps pt pw py qa re ro rs ru rw
sa sb sc sd se sg sh si sk sl sm sn so sr ss st sv sx sy sz
tc td tf tg th tj tk tl tm tn to tr tt tv tw tz
ua ug uk us uy uz va vc ve vg vi vn vu wf ws ye yt za zm zw
""".split()

_GTLDS = """
com org net edu gov mil int info biz name pro mobi tel asia cat coop
jobs museum travel aero post xxx example
app dev page blog shop site online store tech xyz club fun live news
space today top vip wiki work world zone art cloud design digital
email group life link media network plus run show social software
solutions stream studio systems team tools agency center codes company
deals directory education expert foundation gallery guru institute
international management marketing ninja photography productions rocks
services support technology training university ventures vision watch
website wtf chat city data earth energy finance fitness games global
health host house land lawyer legal loans market money movie music one
partners party pics pizza place press pub red report rest review sale
school science shoes singles solar style tips toys trade video wine
""".split()

TLDS = frozenset(_CCTLDS) | frozenset(_GTLDS)

#: two-label public suffixes: "<second>.<cc>".  Generated from the
#: per-ccTLD second-level registration conventions the PSL records.
_SECOND_LEVELS: dict[str, str] = {
    # cc → space-separated second-level labels open for registration
    "uk": "co org me ltd plc net sch ac gov nhs police mod",
    "jp": "co ne or ac ad ed go gr lg",
    "au": "com net org edu gov asn id",
    "nz": "co net org ac geek gen govt health iwi maori mil school",
    "za": "co net org ac gov edu mil nom web",
    "br": "com net org gov edu mil art b blog eco emp far flog imb ind inf jus leg nom rec srv tmp tur vet wiki",
    "in": "co net org ac gov edu res firm gen ind mil nic",
    "cn": "com net org gov edu ac ah bj cq fj gd gs gx gz ha hb he hi hk hl hn jl js jx ln mo nm nx qh sc sd sh sn sx tj tw xj xz yn zj",
    "kr": "co ne or re pe go mil ac hs ms es sc kg seoul busan daegu incheon",
    "tw": "com net org edu gov idv game ebiz club",
    "hk": "com net org edu gov idv",
    "sg": "com net org edu gov per",
    "my": "com net org edu gov mil name",
    "id": "co net or ac go mil web sch biz my",
    "th": "co net or ac go mi in",
    "ph": "com net org edu gov mil i",
    "vn": "com net org edu gov int ac biz info name pro health",
    "mx": "com net org edu gob",
    "ar": "com net org edu gob gov int mil musica tur",
    "co": "com net org edu gov mil nom rec web",
    "ve": "com net org co edu gob info mil web",
    "pe": "com net org edu gob mil nom sld",
    "cl": "gob gov mil",
    "ec": "com net org edu gov gob info med mil pro fin k12",
    "bo": "com net org edu gob gov int mil tv web",
    "py": "com net org edu gov mil coop una",
    "uy": "com net org edu gub mil",
    "tr": "com net org edu gov mil av bbs bel biz dr gen info k12 kep name nc pol tel tv web",
    "il": "co net org ac gov idf k12 muni",
    # US: each state code is itself a registrable public suffix (ma.us)
    "us": (
        "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
        "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
        "ut va vt wa wi wv wy fed isa nsn kids"
    ),
    "sa": "com net org edu gov med pub sch",
    "ae": "co net org ac gov mil sch",
    "eg": "com net org edu gov eun mil name sci",
    "ma": "co net org ac gov press",
    "ng": "com net org edu gov mil mobi name sch i",
    "ke": "co ne or ac go info me mobi sc",
    "tz": "co ne or ac go hotel info me mil mobi sc tv",
    "ug": "co ne or ac go sc",
    "gh": "com org edu gov mil",
    "zm": "com org co ac gov edu sch",
    "ru": "com net org ac edu gov int mil msk spb nov",
    "ua": "com net org edu gov in kiev lviv odessa kharkov dn cv",
    "pl": "com net org edu gov info mil waw wroc krakow gda lodz poznan",
    "hu": "co org info priv sport tm 2000 agrar bolt casino city erotica erotika film forum games hotel ingatlan jogasz konyvelo lakas media news reklam sex shop suli szex tozsde utazas video",
    "ro": "com org nom nt rec store tm www arts firm info",
    "gr": "com net org edu gov",
    "pt": "com net org edu gov int nome publ",
    "es": "com nom org gob edu",
    "fr": "asso com gouv nom prd presse tm aeroport avocat chambagri",
    "it": "gov edu",
    "at": "co or ac gv priv",
    "ch": "com net org gov",
    "pk": "com net org edu gov biz fam gob gok gon gop gos info web",
    "lk": "com net org edu gov ac assn grp hotel int ltd ngo sch soc web",
    "kz": "com net org edu gov mil",
    "by": "com gov mil of",
    "ge": "com net org edu gov mil pvt",
    "am": "co com net org",
    "az": "com net org edu gov biz info int mil name pp pro",
    "ir": "co net org ac gov id sch",
    "iq": "com net org edu gov mil",
    "jo": "com net org edu gov mil name sch",
    "kw": "com net org edu gov ind",
    "lb": "com net org edu gov",
    "om": "com net org edu gov co med museum pro sch",
    "qa": "com net org edu gov mil name sch",
    "ye": "com net org edu gov mil",
    "do": "com net org edu gob gov mil sld web art",
    "gt": "com net org edu gob ind mil",
    "hn": "com net org edu gob mil",
    "ni": "com net org edu gob int mil ac biz info in nom web",
    "pa": "com net org edu gob ac sld abo ing med nom",
    "sv": "com org edu gob red",
    "cr": "co cr ac ed fi go or sa",
    "cu": "com net org edu gov inf",
    "tt": "com net org edu gov biz info pro name",
    "mt": "com net org edu gov",
    "cy": "com net org ac biz ekloges gov ltd press pro tm",
    "bg": "0 1 2 3 4 5 6 7 8 9 a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "rs": "co org edu ac gov in",
    "ba": "com net org edu gov mil unbi unsa co rs",
    "mk": "com net org edu gov inf name",
    "al": "com net org edu gov mil",
    "md": "com net org ac",
    "lt": "com net org edu gov mil",
    "lv": "com net org edu gov mil asn conf id",
    "ee": "com org edu gov riik lib med fie aip pri",
    "is": "com net org edu gov int",
    "mo": "com net org edu gov",
    "mn": "com net org edu gov",
    "mv": "com net org edu gov aero biz coop info int mil museum name pro",
    "mu": "com net org ac co go or",
    "et": "com net org edu gov biz info name",
}

_PRIVATE_SUFFIX2 = frozenset(
    """
github.io gitlab.io bitbucket.io netlify.app vercel.app pages.dev web.app
firebaseapp.com appspot.com herokuapp.com azurewebsites.net cloudapp.net
amazonaws.com cloudfront.net fastly.net akamaized.net
blogspot.com wordpress.com tumblr.com weebly.com wixsite.com squarespace.com
substack.com medium.com ghost.io webflow.io myshopify.com
readthedocs.io surge.sh onrender.com fly.dev deno.dev workers.dev glitch.me
repl.co neocities.org keybase.pub
""".split()
)

SUFFIX2 = (
    frozenset(
        f"{sl}.{cc}" for cc, sls in _SECOND_LEVELS.items() for sl in sls.split()
    )
    | _PRIVATE_SUFFIX2
)

#: rules beyond the exact-depth-1/2 sets above, in the PSL's own line
#: format ('//' comments, '*.' wildcards, '!' exceptions) — swapping in
#: the complete publicsuffix.org dump means pasting it here verbatim.
_RULES_EXTRA = """
// ccTLDs the PSL models as wildcards: any direct child is a suffix
*.bd
*.ck
!www.ck
*.er
*.fj
*.fk
*.jm
*.kh
*.mm
*.np
*.pg
// Japanese city wildcards + their city.* exceptions
*.kawasaki.jp
*.kitakyushu.jp
*.kobe.jp
*.nagoya.jp
*.sapporo.jp
*.sendai.jp
*.yokohama.jp
!city.kawasaki.jp
!city.kitakyushu.jp
!city.kobe.jp
!city.nagoya.jp
!city.sapporo.jp
!city.sendai.jp
!city.yokohama.jp
// US school-district deep suffixes (k12/cc/lib per state + MA extras)
pvt.k12.ma.us
chtr.k12.ma.us
paroch.k12.ma.us
// AWS private-section deep suffixes (snapshot)
s3.amazonaws.com
s3.dualstack.us-east-1.amazonaws.com
s3.dualstack.eu-west-1.amazonaws.com
s3.us-east-1.amazonaws.com
s3.us-east-2.amazonaws.com
s3.us-west-1.amazonaws.com
s3.us-west-2.amazonaws.com
s3.eu-west-1.amazonaws.com
s3.eu-central-1.amazonaws.com
s3.ap-southeast-1.amazonaws.com
s3.ap-northeast-1.amazonaws.com
*.elb.amazonaws.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
"""

#: per-state 3-label US suffixes: k12.ma.us, cc.ma.us, lib.ma.us ...
_US_STATES = (
    "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma md me "
    "mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri sc sd tn tx "
    "ut va vt wa wi wv wy"
).split()
_US_K12 = [f"{kind}.{st}.us" for st in _US_STATES for kind in ("k12", "cc", "lib")]


def _parse_rules(text: str):
    exact: dict[int, set[str]] = {}
    wild: dict[int, set[str]] = {}
    exc: dict[int, set[str]] = {}
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("//"):
            continue
        if ln.startswith("!"):
            s = ln[1:]
            exc.setdefault(s.count(".") + 1, set()).add(s)
        elif ln.startswith("*."):
            base = ln[2:]
            wild.setdefault(base.count(".") + 1, set()).add(base)
        else:
            exact.setdefault(ln.count(".") + 1, set()).add(ln)
    return exact, wild, exc


_exact, _wild, _exc = _parse_rules(_RULES_EXTRA)
for _s in _US_K12:
    _exact.setdefault(3, set()).add(_s)
_exact.setdefault(1, set()).update(TLDS)
_exact.setdefault(2, set()).update(SUFFIX2)

#: depth → exact public-suffix rules of exactly that many labels
RULES: dict[int, frozenset[str]] = {k: frozenset(v) for k, v in _exact.items()}
#: base-depth → wildcard bases ('ck' means '*.ck': children are suffixes)
WILDBASES: dict[int, frozenset[str]] = {k: frozenset(v) for k, v in _wild.items()}
#: depth → exception hosts (each IS the registered domain)
EXCEPTIONS: dict[int, frozenset[str]] = {k: frozenset(v) for k, v in _exc.items()}

#: deepest possible public-suffix depth (wildcards match one deeper
#: than their base)
MAX_SUFFIX_DEPTH = max(
    max(RULES, default=1),
    max((k + 1 for k in WILDBASES), default=1),
)
