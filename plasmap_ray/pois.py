"""POI category registry — plain-data rebuild of the reference's
macro-generated POI typeclass instances.

The reference generates 60+ POI query types via macros
(query-engine-macros/src/main/scala/io/plasmap/queryengine/macros/Macros.scala:109-130)
registered at query-engine/.../POIs.scala:42-253, each bound to an OSM
(key, value) tag pair; Gym is a custom multi-tag instance
(POIs.scala:150-172).  Here the registry is a dict: category name ->
list of (key, value) tags (multi-tag categories match ANY of their
tags), and the query surface takes a category name or raw tag list —
no codegen needed (SURVEY.md §2.10).
"""

from __future__ import annotations

CATEGORIES: dict[str, list[tuple[str, str]]] = {
    # amenity — sustenance
    "restaurant": [("amenity", "restaurant")],
    "fast_food": [("amenity", "fast_food")],
    "cafe": [("amenity", "cafe")],
    "pub": [("amenity", "pub")],
    "bar": [("amenity", "bar")],
    "biergarten": [("amenity", "biergarten")],
    "ice_cream": [("amenity", "ice_cream")],
    # amenity — education
    "school": [("amenity", "school")],
    "kindergarten": [("amenity", "kindergarten")],
    "university": [("amenity", "university")],
    "college": [("amenity", "college")],
    "library": [("amenity", "library")],
    # amenity — transportation
    "parking": [("amenity", "parking")],
    "fuel": [("amenity", "fuel")],
    "bus_station": [("amenity", "bus_station")],
    "taxi": [("amenity", "taxi")],
    "car_rental": [("amenity", "car_rental")],
    "car_wash": [("amenity", "car_wash")],
    "charging_station": [("amenity", "charging_station")],
    "bicycle_rental": [("amenity", "bicycle_rental")],
    "bicycle_parking": [("amenity", "bicycle_parking")],
    "ferry_terminal": [("amenity", "ferry_terminal")],
    # amenity — financial
    "bank": [("amenity", "bank")],
    "atm": [("amenity", "atm")],
    "bureau_de_change": [("amenity", "bureau_de_change")],
    # amenity — healthcare
    "hospital": [("amenity", "hospital")],
    "pharmacy": [("amenity", "pharmacy")],
    "doctor": [("amenity", "doctors")],
    "dentist": [("amenity", "dentist")],
    "veterinary": [("amenity", "veterinary")],
    # amenity — entertainment & culture
    "theatre": [("amenity", "theatre")],
    "cinema": [("amenity", "cinema")],
    "nightclub": [("amenity", "nightclub")],
    "casino": [("amenity", "casino")],
    "arts_centre": [("amenity", "arts_centre")],
    "community_centre": [("amenity", "community_centre")],
    "fountain": [("amenity", "fountain")],
    # amenity — civic / public
    "place_of_worship": [("amenity", "place_of_worship")],
    "townhall": [("amenity", "townhall")],
    "courthouse": [("amenity", "courthouse")],
    "police": [("amenity", "police")],
    "fire_station": [("amenity", "fire_station")],
    "post_office": [("amenity", "post_office")],
    "prison": [("amenity", "prison")],
    "embassy": [("amenity", "embassy")],
    "grave_yard": [("amenity", "grave_yard")],
    "marketplace": [("amenity", "marketplace")],
    "toilets": [("amenity", "toilets")],
    "drinking_water": [("amenity", "drinking_water")],
    "telephone": [("amenity", "telephone")],
    "recycling": [("amenity", "recycling")],
    "shelter": [("amenity", "shelter")],
    # shops
    "supermarket": [("shop", "supermarket")],
    "bakery": [("shop", "bakery")],
    "butcher": [("shop", "butcher")],
    "kiosk": [("shop", "kiosk")],
    "mall": [("shop", "mall")],
    "department_store": [("shop", "department_store")],
    "convenience": [("shop", "convenience")],
    "clothes": [("shop", "clothes")],
    "hairdresser": [("shop", "hairdresser")],
    # leisure
    "park": [("leisure", "park")],
    "sports_centre": [("leisure", "sports_centre")],
    "playground": [("leisure", "playground")],
    "stadium": [("leisure", "stadium")],
    "swimming_pool": [("leisure", "swimming_pool")],
    "golf_course": [("leisure", "golf_course")],
    # multi-tag category (the reference's custom Gym instance)
    "gym": [("leisure", "fitness_centre"), ("leisure", "gym"), ("amenity", "gym")],
    # tourism
    "hotel": [("tourism", "hotel")],
    "hostel": [("tourism", "hostel")],
    "guest_house": [("tourism", "guest_house")],
    "camp_site": [("tourism", "camp_site")],
    "museum": [("tourism", "museum")],
    "gallery": [("tourism", "gallery")],
    "viewpoint": [("tourism", "viewpoint")],
    "information": [("tourism", "information")],
    "zoo": [("tourism", "zoo")],
    "theme_park": [("tourism", "theme_park")],
}


def tags_for(category: str) -> list[tuple[str, str]]:
    try:
        return CATEGORIES[category]
    except KeyError:
        raise KeyError(f"unknown POI category {category!r}; known: {sorted(CATEGORIES)[:10]}...") from None
