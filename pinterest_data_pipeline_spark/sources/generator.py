"""Deterministic synthetic raw pin/geo/user generator (FIXTURES.md §1-§3).

Stands in for the reference's MySQL row-sampler emulators
(``python_files/user_posting_emulation_uploader.py:49-72``): N aligned
triplets sharing ``index`` as a 1:1 key, with every dirty-data pattern the
cleaning operators must handle — sentinel strings, empty strings, k/M
follower suffixes, ``Local save in`` prefixes, whitespace-padded countries,
boundary ages, and full-row duplicates.

Pure Python + ``random.Random(seed)`` so fixtures are reproducible without a
SparkSession; callers lift the dicts via ``spark.createDataFrame(rows,
schema)``.
"""

from __future__ import annotations

import random
import uuid
from typing import Any

CATEGORIES = [
    "art",
    "beauty",
    "travel",
    "tattoos",
    "diy-and-crafts",
    "finance",
    "education",
    "quotes",
    "vehicles",
    "event-planning",
    "christmas",
    "mens-fashion",
]

COUNTRIES = [
    "United States",
    "United Kingdom",
    "France",
    "Germany",
    "Brazil",
    "India",
    "Japan",
    "Australia",
    "Canada",
    "Mexico",
    "Nigeria",
    "Spain",
    "Italy",
    "China",
    "Russia",
    "Egypt",
    "Kenya",
    "Peru",
    "Norway",
    "Poland",
]

FIRST_NAMES = ["Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald", "Radia", "Vint"]
LAST_NAMES = ["Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth", "Perlman", "Cerf"]

# Boundary ages exercised explicitly (FIXTURES.md §3): bucket edges of
# 18-24 / 25-35 / 36-50 / 50+.
BOUNDARY_AGES = [17, 18, 24, 25, 35, 36, 50, 51]

SENTINEL_TITLE = "No Title Data Available"
SENTINEL_DESC = "No description available Story format"
SENTINEL_USER = "User Info Error"
SENTINEL_IMG = "Image src error"
SENTINEL_TAGS = "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"


def make_raw_entities(
    n: int = 1000, seed: int = 42, dup_frac: float = 0.05, dirty_frac: float = 0.10
) -> tuple[list[dict[str, Any]], list[dict[str, Any]], list[dict[str, Any]]]:
    """Return (pin_rows, geo_rows, user_rows) as aligned dict triplets."""
    rng = random.Random(seed)
    pins: list[dict[str, Any]] = []
    geos: list[dict[str, Any]] = []
    users: list[dict[str, Any]] = []

    def dirty(value: str, sentinel: str) -> str:
        r = rng.random()
        if r < dirty_frac / 2:
            return sentinel
        if r < dirty_frac:
            return ""
        return value

    for i in range(n):
        category = rng.choice(CATEGORIES)
        fc = rng.random()
        if fc < 0.25:
            follower_count = f"{rng.randint(1, 999)}k"
        elif fc < 0.35:
            follower_count = f"{rng.randint(1, 9)}M"
        elif fc < 0.40:
            follower_count = rng.choice([SENTINEL_USER, ""])
        else:
            # plain counts with deliberate cross-row ties (RANK tie fixtures)
            follower_count = str(rng.choice([25, 100, 250, 532, 1000, rng.randint(1, 99999)]))
        pins.append(
            {
                "index": i,
                "unique_id": str(uuid.UUID(int=rng.getrandbits(128))),
                "title": dirty(f"Post {i} about {category}", SENTINEL_TITLE),
                "description": dirty(f"A look at {category} number {i}", SENTINEL_DESC),
                "poster_name": dirty(rng.choice(FIRST_NAMES), SENTINEL_USER),
                "follower_count": follower_count,
                "tag_list": dirty(",".join(rng.sample(CATEGORIES, 3)), SENTINEL_TAGS),
                "is_image_or_video": rng.choice(
                    ["image", "video", "multi-video(story page format)"]
                ),
                "image_src": dirty(f"https://i.pinimg.com/{i}.jpg", SENTINEL_IMG),
                "downloaded": rng.choice(["0", "1", "1", "1", ""]),
                "save_location": f"Local save in /data/{category}",
                "category": category,
            }
        )
        country = rng.choice(COUNTRIES)
        if rng.random() < dirty_frac:
            country = f" {country} "  # whitespace variant, trimmed by F1
        geos.append(
            {
                "index": i,
                "timestamp": (
                    f"{rng.randint(2015, 2022)}-{rng.randint(1, 12):02d}-"
                    f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:"
                    f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
                ),
                "latitude": f"{rng.uniform(-90, 90):.4f}",
                "longitude": f"{rng.uniform(-180, 180):.4f}",
                "country": country,
            }
        )
        users.append(
            {
                "index": i,
                "date_joined": (
                    f"{rng.randint(2015, 2021)}-{rng.randint(1, 12):02d}-"
                    f"{rng.randint(1, 28):02d}T{rng.randint(0, 23):02d}:"
                    f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}"
                ),
                "first_name": rng.choice(FIRST_NAMES),
                "last_name": rng.choice(LAST_NAMES),
                "age": rng.choice(BOUNDARY_AGES) if rng.random() < 0.3 else rng.randint(16, 75),
            }
        )

    # full-row duplicates (dedup fixtures, BATCH:76)
    n_dups = int(n * dup_frac)
    for i in range(n_dups):
        j = rng.randrange(n)
        pins.append(dict(pins[j]))
        geos.append(dict(geos[j]))
        users.append(dict(users[j]))
    return pins, geos, users
