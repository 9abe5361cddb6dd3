"""Import-time stubs so the reference package at /root/reference/src can be
loaded without spacy/unidecode installed. Used ONLY to generate golden test
fixtures by observing reference behavior (never at engine runtime).

The unidecode stub mirrors graft.core.Text.transliterate (specials table +
NFKD-strip fallback) so goldens reflect the engine's documented
transliteration subset on the controlled fixture vocabulary.
"""
import sys
import types
import unicodedata

_SPECIALS = {
    'ß': 'ss', 'ẞ': 'SS', 'æ': 'ae', 'Æ': 'AE', 'œ': 'oe', 'Œ': 'OE',
    'ø': 'o', 'Ø': 'O', 'đ': 'd', 'Đ': 'D', 'ð': 'd', 'Ð': 'D',
    'þ': 'th', 'Þ': 'Th', 'ł': 'l', 'Ł': 'L', 'ı': 'i', 'İ': 'I',
    'ħ': 'h', 'Ħ': 'H', 'ŋ': 'ng', 'Ŋ': 'NG', 'ĸ': 'k',
    '×': 'x', '÷': '/', '©': '(c)', '®': '(r)', '«': '<<', '»': '>>',
    '‘': "'", '’': "'", '“': '"', '”': '"', '–': '-', '—': '--',
    '…': '...', ' ': ' ', '¡': '!', '¿': '?', '°': 'deg',
    'µ': 'u', '·': '*',
}


def _translit(s: str) -> str:
    out = []
    for ch in s:
        if ord(ch) < 128:
            out.append(ch)
        elif ch in _SPECIALS:
            out.append(_SPECIALS[ch])
        else:
            out.append(''.join(c for c in unicodedata.normalize('NFKD', ch) if ord(c) < 128))
    return ''.join(out)


def install():
    spacy = types.ModuleType('spacy')
    lang = types.ModuleType('spacy.language')

    class Language:
        pass

    lang.Language = Language
    spacy.language = lang

    def _no_spacy(*a, **k):
        raise RuntimeError('spacy disabled in golden generation')

    spacy.load = _no_spacy
    sys.modules['spacy'] = spacy
    sys.modules['spacy.language'] = lang

    uni = types.ModuleType('unidecode')
    uni.unidecode = _translit
    sys.modules['unidecode'] = uni

    sys.path.insert(0, '/root/reference/src')
