"""Tiny static gazetteer: cities, states (+2-letter abbreviations),
countries, and containment maps.

Analog of the Tipster gazetteer (TipsterData.scala:14-77) and the
hardcoded US state-abbreviation table (AbbreviationData.scala:5-55),
sized for the synthetic fixture (FIXTURES.md §6). Shipped as data in
code: small enough to live in every task closure.
"""

from __future__ import annotations

STATES: dict[str, str] = {
    # abbreviation -> full name
    "TX": "Texas",
    "CA": "California",
    "NY": "New York",
    "WA": "Washington",
    "OR": "Oregon",
    "AZ": "Arizona",
    "CO": "Colorado",
    "IL": "Illinois",
    "GA": "Georgia",
    "FL": "Florida",
    "MA": "Massachusetts",
    "OH": "Ohio",
    "MI": "Michigan",
    "NC": "North Carolina",
    "VA": "Virginia",
}

STATE_OF_ABBR = STATES
ABBR_OF_STATE = {v: k for k, v in STATES.items()}

CITY_STATE: dict[str, str] = {
    # city -> state full name (containment map, TipsterData.scala:60-70)
    "Austin": "Texas", "Dallas": "Texas", "Houston": "Texas",
    "Fresno": "California", "Oakland": "California", "Anaheim": "California",
    "Albany": "New York", "Buffalo": "New York", "Yonkers": "New York",
    "Tacoma": "Washington", "Spokane": "Washington", "Everett": "Washington",
    "Salem": "Oregon", "Eugene": "Oregon", "Bend": "Oregon",
    "Tempe": "Arizona", "Tucson": "Arizona", "Mesa": "Arizona",
    "Denver": "Colorado", "Boulder": "Colorado", "Aurora": "Colorado",
    "Peoria": "Illinois", "Joliet": "Illinois", "Elgin": "Illinois",
    "Macon": "Georgia", "Athens": "Georgia", "Augusta": "Georgia",
    "Tampa": "Florida", "Orlando": "Florida", "Hialeah": "Florida",
    "Lowell": "Massachusetts", "Quincy": "Massachusetts", "Newton": "Massachusetts",
    "Akron": "Ohio", "Dayton": "Ohio", "Toledo": "Ohio",
    "Lansing": "Michigan", "Flint": "Michigan", "Warren": "Michigan",
    "Durham": "North Carolina", "Cary": "North Carolina", "Raleigh": "North Carolina",
    "Norfolk": "Virginia", "Roanoke": "Virginia", "Hampton": "Virginia",
}

CITIES = frozenset(CITY_STATE)
STATE_NAMES = frozenset(STATES.values())
COUNTRIES = frozenset(
    ["Canada", "Mexico", "Brazil", "France", "Germany", "Japan", "India",
     "Kenya", "Norway", "Chile"]
)


def expand_state_abbreviation(loc: str) -> str:
    """``City, XY`` -> ``City, Fullstate`` when the gazetteer confirms the
    city belongs to that state (TipsterData.expandStateAbbreviation:93-108;
    CorefHelperMethods.scala:378-425)."""
    if ", " in loc:
        city, _, st = loc.rpartition(", ")
        full = STATES.get(st.strip().upper())
        if full and CITY_STATE.get(city.strip()) == full:
            return f"{city.strip()}, {full}"
    return loc


def is_location_token(tok: str) -> bool:
    return tok in CITIES or tok in STATE_NAMES or tok in COUNTRIES
