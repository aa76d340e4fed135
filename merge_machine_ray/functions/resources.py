"""In-repo resource tables for the categorical resource analyzers
(SURVEY.md §2.2 S8, §2.3 A5/A6).

The reference GENERATES these from public datasets at install time
(``merge_machine/analyzers/gen_resources.py:138-188``: geonames cities,
mledoze/countries) and feeds them to Elasticsearch keep/synonym filters
(``resource_analyzer_definitions.py:116-233``). This sandbox has no
network, so a representative PUBLIC-KNOWLEDGE subset is pinned here:
common country names/adjectives/codes in French/English/native forms
canonicalized to ISO-3166 alpha-3, and major French cities (the
reference's domain is French establishment data) plus a few world
capitals, with frequent spelling variants.

All entries are pre-normalized the way the analyzers see tokens
(lowercase, accent-folded — ``functions.normalize.normalize_text``).
Multi-token variants use the separator of their analyzer's shingle
filter: '_' for country (the reference's ``my_shingle``
``token_separator``), ' ' for city (stock ``shingle``).

Callers may still inject their own tables; these are the defaults.
"""

from __future__ import annotations

# --------------------------------------------------------------- countries
# variant (normalized, '_'-shingled) → ISO-3166 alpha-3 canonical form
COUNTRY_SYNONYMS: dict[str, str] = {}

_COUNTRY_VARIANTS: dict[str, list[str]] = {
    "fra": ["france", "republique_francaise", "french_republic"],
    "deu": ["allemagne", "germany", "deutschland", "republique_federale_d_allemagne"],
    "usa": ["etats_unis", "united_states", "usa", "etats_unis_d_amerique", "united_states_of_america", "amerique", "america"],
    "gbr": ["royaume_uni", "united_kingdom", "great_britain", "grande_bretagne", "angleterre", "england"],
    "esp": ["espagne", "spain", "espana"],
    "ita": ["italie", "italy", "italia"],
    "bel": ["belgique", "belgium", "belgie"],
    "che": ["suisse", "switzerland", "schweiz", "svizzera"],
    "nld": ["pays_bas", "netherlands", "nederland", "hollande", "holland"],
    "prt": ["portugal"],
    "lux": ["luxembourg", "letzebuerg"],
    "irl": ["irlande", "ireland", "eire"],
    "aut": ["autriche", "austria", "osterreich"],
    "dnk": ["danemark", "denmark", "danmark"],
    "swe": ["suede", "sweden", "sverige"],
    "nor": ["norvege", "norway", "norge"],
    "fin": ["finlande", "finland", "suomi"],
    "pol": ["pologne", "poland", "polska"],
    "cze": ["republique_tcheque", "czech_republic", "czechia", "tchequie"],
    "grc": ["grece", "greece", "hellas"],
    "tur": ["turquie", "turkey", "turkiye"],
    "rus": ["russie", "russia", "rossiya", "federation_de_russie"],
    "ukr": ["ukraine", "ukraina"],
    "chn": ["chine", "china", "zhongguo", "republique_populaire_de_chine"],
    "jpn": ["japon", "japan", "nippon", "nihon"],
    "kor": ["coree_du_sud", "south_korea", "coree", "korea"],
    "ind": ["inde", "india", "bharat"],
    "bra": ["bresil", "brazil", "brasil"],
    "arg": ["argentine", "argentina"],
    "mex": ["mexique", "mexico"],
    "can": ["canada"],
    "aus": ["australie", "australia"],
    "nzl": ["nouvelle_zelande", "new_zealand"],
    "mar": ["maroc", "morocco", "al_maghrib"],
    "dza": ["algerie", "algeria", "al_jazair"],
    "tun": ["tunisie", "tunisia"],
    "sen": ["senegal"],
    "civ": ["cote_d_ivoire", "ivory_coast"],
    "cmr": ["cameroun", "cameroon"],
    "egy": ["egypte", "egypt", "misr"],
    "zaf": ["afrique_du_sud", "south_africa"],
    "nga": ["nigeria"],
    "mdg": ["madagascar"],
    "vnm": ["vietnam", "viet_nam"],
    "tha": ["thailande", "thailand"],
    "idn": ["indonesie", "indonesia"],
    "phl": ["philippines", "pilipinas"],
    "isr": ["israel"],
    "lbn": ["liban", "lebanon"],
    "sau": ["arabie_saoudite", "saudi_arabia"],
    "are": ["emirats_arabes_unis", "united_arab_emirates", "uae"],
    "chl": ["chili", "chile"],
    "col": ["colombie", "colombia"],
    "per": ["perou", "peru"],
    "rou": ["roumanie", "romania"],
    "hun": ["hongrie", "hungary", "magyarorszag"],
    "bgr": ["bulgarie", "bulgaria"],
    "hrv": ["croatie", "croatia", "hrvatska"],
    "srb": ["serbie", "serbia", "srbija"],
    "svk": ["slovaquie", "slovakia", "slovensko"],
    "svn": ["slovenie", "slovenia", "slovenija"],
    "est": ["estonie", "estonia", "eesti"],
    "lva": ["lettonie", "latvia", "latvija"],
    "ltu": ["lituanie", "lithuania", "lietuva"],
}

for _code, _variants in _COUNTRY_VARIANTS.items():
    COUNTRY_SYNONYMS[_code] = _code
    for _v in _variants:
        COUNTRY_SYNONYMS[_v] = _code

#: the keep filter admits every known variant (reference country_keep)
COUNTRY_KEEP: frozenset[str] = frozenset(COUNTRY_SYNONYMS)


# ------------------------------------------------------------------ cities
# variant (normalized, ' '-shingled) → canonical French name
CITY_SYNONYMS: dict[str, str] = {}

_CITY_VARIANTS: dict[str, list[str]] = {
    "paris": ["paname", "lutece"],
    "marseille": ["marseilles"],
    "lyon": ["lyons"],
    "toulouse": [],
    "nice": [],
    "nantes": [],
    "montpellier": [],
    "strasbourg": ["strassburg"],
    "bordeaux": [],
    "lille": [],
    "rennes": [],
    "reims": ["rheims"],
    "toulon": [],
    "saint etienne": ["st etienne"],
    "le havre": ["havre"],
    "grenoble": [],
    "dijon": [],
    "angers": [],
    "nimes": [],
    "villeurbanne": [],
    "clermont ferrand": ["clermont"],
    "le mans": [],
    "aix en provence": ["aix"],
    "brest": [],
    "tours": [],
    "amiens": [],
    "limoges": [],
    "annecy": [],
    "perpignan": [],
    "besancon": [],
    "metz": [],
    "orleans": [],
    "rouen": [],
    "mulhouse": [],
    "caen": [],
    "nancy": [],
    "avignon": [],
    "cannes": [],
    "antibes": [],
    "la rochelle": [],
    "poitiers": [],
    "versailles": [],
    "pau": [],
    "bayonne": [],
    "montreuil": [],
    "creteil": [],
    "nanterre": [],
    "vitry sur seine": [],
    "colmar": [],
    "bourges": [],
    "la roche sur yon": [],
    "ajaccio": [],
    "bastia": [],
    "londres": ["london"],
    "bruxelles": ["brussels", "brussel"],
    "geneve": ["geneva", "genf"],
    "berlin": [],
    "madrid": [],
    "rome": ["roma"],
    "lisbonne": ["lisbon", "lisboa"],
    "amsterdam": [],
    "new york": ["nyc", "new york city"],
    "montreal": [],
    "dakar": [],
    "abidjan": [],
    "casablanca": [],
    "alger": ["algiers"],
    "tunis": [],
}

for _canon, _variants in _CITY_VARIANTS.items():
    CITY_SYNONYMS[_canon] = _canon
    for _v in _variants:
        CITY_SYNONYMS[_v] = _canon

CITY_KEEP: frozenset[str] = frozenset(CITY_SYNONYMS)
