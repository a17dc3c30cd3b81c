"""Terminal input helper for the interactive play CLI.

Reference counterpart: ``utils/input_helper.py:4`` (``InputHelper``) — a
raw-tty single-character reader.  The reference never actually wires it in
(its ``play.py`` uses ``cv.waitKey``); here it backs the terminal UI of
``cli/play.py --interactive`` so single keypresses work without ENTER.

Design differences from the reference (deliberate):
  - degrades gracefully when stdin is not a tty (pipes, CI, pytest):
    falls back to line-buffered ``input()`` and strips to one character;
  - restores terminal settings on *any* exit path, including KeyboardInterrupt;
  - Ctrl-C / Ctrl-D in raw mode are translated to ``"q"`` so the caller's
    quit path runs instead of the process dying with a cooked terminal.
"""
from __future__ import annotations

import sys


class InputHelper:
    """Reads single characters from the terminal.

    :param interactive: when True and stdin is a tty, each keypress is
        delivered immediately (raw mode, no ENTER needed).  Otherwise
        reads a whole line and returns its first character.
    """

    def __init__(self, interactive: bool = True, stream=None):
        self.stream = stream if stream is not None else sys.stdin
        self.interactive = bool(interactive) and self._is_tty()

    def _is_tty(self) -> bool:
        try:
            return self.stream.isatty()
        except (AttributeError, ValueError):
            return False

    def read_character(self) -> str:
        """Return the next character typed by the user.

        Raw single-key read in interactive mode; first character of the
        next line otherwise.  Empty string means end of input.
        """
        if not self.interactive:
            try:
                line = self.stream.readline()
            except (EOFError, ValueError):
                return ""
            if line == "":
                return ""
            return line.strip()[:1] or "\n"

        import termios
        import tty

        fd = self.stream.fileno()
        old_settings = termios.tcgetattr(fd)
        try:
            tty.setraw(fd)
            ch = self.stream.read(1)
        finally:
            termios.tcsetattr(fd, termios.TCSADRAIN, old_settings)
        if ch in ("\x03", "\x04"):  # Ctrl-C / Ctrl-D -> clean quit
            return "q"
        return ch
