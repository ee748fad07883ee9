"""Minimal xacro property reader for quadrotor parameter files.

Capability parity with `parse_xacro_file` (`/root/reference/src/utils/utils.py:748-772`),
which scraped `<xacro:property name=... value=...>` plus the inertia block out
of the RotorS hummingbird description.  Implemented here with a real XML parse
instead of string hacking.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET


def parse_xacro_properties(path: str) -> dict:
    """Return {property_name: value_string} plus an 'body_inertia' entry
    (list of attribute dicts of any <inertia> elements found)."""
    with open(path) as f:
        text = f.read()
    # xacro files use the xmlns:xacro namespace prefix; ET refuses unbound
    # prefixes, so rewrite `xacro:` tags to plain names before parsing
    text = re.sub(r"xmlns:xacro=\"[^\"]*\"", "", text, count=1)
    text = re.sub(r"<(/?)xacro:", r"<\1xacro_", text)
    root = ET.fromstring(text)

    attrib: dict = {}
    for el in root.iter():
        tag = el.tag.split("}")[-1]
        if tag in ("property", "xacro_property") and "name" in el.attrib and "value" in el.attrib:
            attrib[el.attrib["name"]] = el.attrib["value"]
        elif tag == "inertia":
            attrib.setdefault("body_inertia", []).append(dict(el.attrib))
    return attrib
