"""Docs-site validation, device-free.

The reference's Sphinx site builds on readthedocs
(`/root/reference/docs/conf.py` + `.readthedocs.yaml`); our analog is
mkdocs.yml over docs/ (decision record in mkdocs.yml: no static-site
builder installs in this image). Since `mkdocs build` can't run here,
these tests validate what the build would: every nav target exists,
every intra-doc relative link and anchor resolves, and every page is
reachable from the index.
"""

import pathlib
import re

import yaml

REPO = pathlib.Path(__file__).parent.parent
DOCS = REPO / "docs"

_LINK = re.compile(r"\[[^\]]*\]\(([^)\s]+)\)")
_HEADING = re.compile(r"^#{1,6}\s+(.*)$", re.M)


def _nav_targets(node):
    if isinstance(node, str):
        yield node
    elif isinstance(node, list):
        for item in node:
            yield from _nav_targets(item)
    elif isinstance(node, dict):
        for v in node.values():
            yield from _nav_targets(v)


def _anchor(text: str) -> str:
    """mkdocs/GitHub-style heading -> anchor slug."""
    text = re.sub(r"[`*_]", "", text.strip().lower())
    text = re.sub(r"[^\w\- ]", "", text)
    return text.replace(" ", "-")


def test_mkdocs_nav_targets_exist():
    cfg = yaml.safe_load((REPO / "mkdocs.yml").read_text())
    targets = list(_nav_targets(cfg["nav"]))
    assert targets, "empty nav"
    for t in targets:
        assert (DOCS / t).is_file(), f"mkdocs.yml nav target missing: {t}"


def test_every_docs_page_is_in_the_nav():
    cfg = yaml.safe_load((REPO / "mkdocs.yml").read_text())
    nav = set(_nav_targets(cfg["nav"]))
    pages = {p.name for p in DOCS.glob("*.md")}
    missing = pages - nav
    assert not missing, f"docs pages not in mkdocs nav: {sorted(missing)}"


def test_intra_doc_links_resolve():
    """Every relative markdown link in docs/*.md points at a real file,
    and fragment links target a real heading anchor in that file."""
    anchors = {}
    for page in DOCS.glob("*.md"):
        anchors[page.name] = {_anchor(h)
                              for h in _HEADING.findall(page.read_text())}

    problems = []
    for page in DOCS.glob("*.md"):
        for link in _LINK.findall(page.read_text()):
            if link.startswith(("http://", "https://", "mailto:")):
                continue
            target, _, frag = link.partition("#")
            if not target:  # same-page fragment
                if frag and _anchor(frag) not in anchors[page.name]:
                    problems.append(f"{page.name}: dead anchor #{frag}")
                continue
            if target.endswith((".md", ".py", ".sh", ".yml", ".toml",
                                ".json")):
                resolved = (DOCS / target).resolve()
                if not resolved.is_file():
                    problems.append(f"{page.name}: dead link {link}")
                elif (frag and target.endswith(".md")
                      and resolved.name in anchors
                      and _anchor(frag) not in anchors[resolved.name]):
                    problems.append(f"{page.name}: dead anchor {link}")
    assert not problems, "\n".join(problems)


def test_readme_links_to_docs_resolve():
    for link in _LINK.findall((REPO / "README.md").read_text()):
        if link.startswith(("http://", "https://", "mailto:", "#")):
            continue
        target = link.partition("#")[0]
        if target:
            assert (REPO / target).exists(), f"README dead link: {link}"
