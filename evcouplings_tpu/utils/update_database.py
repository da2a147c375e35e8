"""
`evcouplings_dbupdate` command-line app: download/refresh the sequence
databases (UniProt, UniRef90/100) and SIFTS mapping files.

Parity target: reference evcouplings/utils/update_database.py —
symlink_force (:43), download_ftp_file (:59), run (:102), CLI (:176).
"""

import datetime
import errno
import ftplib
import os
import zlib
from functools import partial
from pathlib import Path

import click

from evcouplings_tpu.utils.helpers import Progressbar

UNIPROT_URL = "ftp.uniprot.org"
UNIPROT_CWD = (
    "/pub/databases/uniprot/current_release/knowledgebase/complete/"
)
UNIPROT_FILE = "uniprot_{type}.fasta.gz"

DB_URL = "ftp.uniprot.org"
DB_CWD = "/pub/databases/uniprot/uniref/{type}/"
DB_FILE = "{type}.fasta.gz"

DB_SUFFIX = "{type}_{year}_{month}.fasta"
DB_CURRENT = "{type}_current.fasta"

SIFTS_SUFFIX = (
    "pdb_chain_uniprot_plus_{year}_{month}_{day}.{extension}"
)
SIFTS_CURRENT = "pdb_chain_uniprot_plus_current.{extension}"


def symlink_force(target, link_name):
    """Create a symlink, replacing an existing one."""
    try:
        os.symlink(target, link_name)
    except OSError as e:
        if e.errno == errno.EEXIST:
            os.remove(link_name)
            os.symlink(target, link_name)
        else:
            raise e


def download_ftp_file(ftp_url, ftp_cwd, file_url, output_path,
                      file_handling="wb", gziped=False, verbose=False):
    """Download a file from an FTP server, decompressing gzip content
    on the fly into output_path."""
    def _callback(_bar, decompressor, chunk):
        if gziped:
            out.write(decompressor.decompress(chunk))
        else:
            out.write(chunk)
        if verbose:
            _bar += len(chunk)

    ftp = ftplib.FTP(ftp_url)
    ftp.login()
    ftp.cwd(ftp_cwd)
    with open(output_path, file_handling) as out:
        filesize = ftp.size(file_url)
        pbar = Progressbar(filesize) if verbose else None

        # automatic gzip header detection
        decompressor = zlib.decompressobj(zlib.MAX_WBITS | 32)
        callback = partial(_callback, pbar, decompressor)
        ftp.retrbinary(
            "RETR %s" % file_url, callback, blocksize=8192
        )
    ftp.quit()


def run(**kwargs):
    """Refresh SIFTS mapping files and UniProt/UniRef databases."""
    from evcouplings_tpu.compare.sifts import SIFTS

    now = datetime.datetime.now()
    year, month, day = now.year, now.month, now.day
    verbose = kwargs.get("verbose", False)
    symlink = kwargs.get("symlink", False)

    # SIFTS mapping table + sequence database
    if verbose:
        print("Updating SIFTS")

    sifts_dir = os.path.abspath(
        kwargs.get("sifts", os.path.realpath(__file__))
    )
    Path(sifts_dir).mkdir(parents=True, exist_ok=True)

    sifts = os.path.join(sifts_dir, SIFTS_SUFFIX)
    sifts_curr = os.path.join(sifts_dir, SIFTS_CURRENT)
    sifts_table = sifts.format(
        year=year, month=month, day=day, extension="csv"
    )
    sifts_fasta = sifts.format(
        year=year, month=month, day=day, extension="fasta"
    )

    # constructing SIFTS with a non-existent table path triggers the
    # download + conversion
    s_new = SIFTS(sifts_table)
    s_new.create_sequence_file(sifts_fasta)

    if symlink:
        symlink_force(sifts_table, sifts_curr.format(extension="csv"))
        symlink_force(sifts_fasta, sifts_curr.format(extension="fasta"))

    # sequence databases
    db_path = os.path.abspath(
        kwargs.get("db", os.path.realpath(__file__))
    )
    for db_type in ["uniprot", "uniref100", "uniref90"]:
        if verbose:
            print("Updating", db_type)

        db_full_path = os.path.join(db_path, db_type)
        Path(db_full_path).mkdir(parents=True, exist_ok=True)

        out_path = os.path.join(
            db_full_path,
            DB_SUFFIX.format(type=db_type, year=year, month=month),
        )
        db_curr = os.path.join(
            db_full_path, DB_CURRENT.format(type=db_type)
        )

        if db_type == "uniprot":
            # SwissProt + TrEMBL concatenated into one file
            for i, type_d in enumerate(["sprot", "trembl"]):
                file_url = UNIPROT_FILE.format(type=type_d)
                download_ftp_file(
                    UNIPROT_URL, UNIPROT_CWD, file_url, out_path,
                    gziped=True,
                    file_handling="ab" if i else "wb",
                    verbose=verbose,
                )
        else:
            db_file = DB_FILE.format(type=db_type)
            db_cwd = DB_CWD.format(type=db_type)
            download_ftp_file(
                DB_URL, db_cwd, db_file, out_path,
                gziped=True, verbose=verbose,
            )

        if symlink:
            symlink_force(out_path, db_curr)


CONTEXT_SETTINGS = dict(help_option_names=["-h", "--help"])


@click.command(context_settings=CONTEXT_SETTINGS)
@click.option(
    "-s", "--sifts", default="databases/SIFTS/",
    help="SIFTS output directory",
)
@click.option(
    "-d", "--db", default="databases/jackhmmer/",
    help="Uniprot output directory",
)
@click.option(
    "-l", "--symlink", default=False, is_flag=True,
    help="Creates symlink with ending '_current.' pointing to the "
         "newly created db files",
)
@click.option(
    "-v", "--verbose", default=False, is_flag=True,
    help="Enables verbose output",
)
def app(**kwargs):
    """Update database command line interface."""
    run(**kwargs)


if __name__ == "__main__":
    app()
