"""Archive XML metadata: byte-exact build and tolerant parse.

The reference serializes codec parameters into an XML fragment in the archive
header (encodefile.rs:93-117) and reconstructs Parameters from it on decode
via quick-xml (decodefile.rs:232-303).  The built bytes here are identical to
the reference's; parsing extracts FS/BLKLEN/CODES/T and — replicating the
reference quirk — always uses the default blocks_per_frame (it is not
serialized, decodefile.rs:295-300)."""

from __future__ import annotations

import re

from ..errors import ArchiveHeaderXMLInvalid, ArchiveHeaderXMLRiceCode
from ..params import Parameters


def build_xml(sample_rate: int, params: Parameters) -> bytes:
    parts = [
        '<X3ARCH PROG="x3new.m" VERSION="2.0" />',
        '<CFG ID="0" FTYPE="XML" />',
        '<CFG ID="1" FTYPE="WAV">',
        f'<FS UNIT="Hz">{sample_rate}</FS>',
        "<SUFFIX>wav</SUFFIX>",
        '<CODEC TYPE="X3" VERS="2">',
        f"<BLKLEN>{params.block_len}</BLKLEN>",
        f'<CODES N="4">RICE{params.codes[0]},RICE{params.codes[1]},RICE{params.codes[2]},BFP</CODES>',
        "<FILTER>DIFF</FILTER>",
        "<NBITS>16</NBITS>",
        f'<T N="3">{params.thresholds[0]},{params.thresholds[1]},{params.thresholds[2]}</T>',
        "</CODEC>",
        "</CFG>",
    ]
    return "".join(parts).encode("ascii")


def _find_tag(xml: str, tag: str) -> str:
    m = re.search(rf"<{tag}\b[^>]*>(.*?)</{tag}>", xml, re.DOTALL)
    if not m:
        raise ArchiveHeaderXMLInvalid(f"missing <{tag}> in archive XML")
    return m.group(1).strip()


def parse_xml(xml_bytes: bytes) -> tuple[int, Parameters]:
    """Extract (sample_rate, Parameters) from the archive XML payload."""
    xml = xml_bytes.rstrip(b"\x00").decode("utf-8", errors="replace")
    fs = int(_find_tag(xml, "FS"))
    block_len = int(_find_tag(xml, "BLKLEN"))
    codes_txt = _find_tag(xml, "CODES")
    thresholds = tuple(int(t) for t in _find_tag(xml, "T").split(","))

    rice_ids = []
    for word in codes_txt.split(","):
        word = word.strip()
        if word == "BFP":
            continue
        m = re.fullmatch(r"RICE([0-3])", word)
        if not m:
            raise ArchiveHeaderXMLRiceCode(f"invalid rice code {word!r}")
        rice_ids.append(int(m.group(1)))
    if len(rice_ids) < 3 or len(thresholds) < 3:
        raise ArchiveHeaderXMLInvalid("need 3 rice codes and 3 thresholds")

    params = Parameters(
        block_len=block_len,
        blocks_per_frame=Parameters().blocks_per_frame,  # not serialized (quirk)
        codes=tuple(rice_ids[:3]),
        thresholds=thresholds[:3],
    )
    return fs, params
