"""Command-line entry points (the reference's four CLIs + the TFRecords
writer, /root/reference/{train,stylize_image,stylize_webcam,slow_style,
tfrecords_writer}.py), installed as console scripts via pyproject.toml.

The repo-root ``cli/`` directory holds thin dev-tree launchers
(``python cli/train.py ...``) that delegate here; this package is what a
pip install ships, keeping ``cli`` out of the global site-packages
namespace (round-4 advisor fix).
"""
