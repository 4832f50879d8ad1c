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

Rule semantics implemented by crawler.urlnorm.tpd_expr / _tpd_one:
  - a host whose last label is not in TLDS is not under any public
    suffix → 'notpd' (Guava isUnderPublicSuffix() == false)
  - if the last two labels form a suffix in SUFFIX2, the TPD is the
    last THREE labels (needs ≥3 labels, else notpd)
  - otherwise the TPD is the last two labels

Scale shape: membership tests compile to Catalyst InSet (hash lookup)
via Column.isin — O(1) per row regardless of list size, JVM-side.
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
    "bd": "com net org edu gov ac info mil",
    "lk": "com net org edu gov ac assn grp hotel int ltd ngo sch soc web",
    "np": "com net org edu gov aero asia biz coop info mil mobi museum name pro",
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
    "jm": "com net org edu gov mil",
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
    "kh": "com net org edu gov mil per",
    "mm": "com net org edu gov",
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
