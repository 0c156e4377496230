"""Hand-authored miniature GVF/GTF fixtures.

Format follows the public Ensembl GVF/GTF specs (the same formats the
reference parses).  Contents are original: three variants — one with
no effects (intergenic), one with four effects across three
transcripts, one without an rsid (must be dropped) — and a small GTF
with gene/transcript/exon features for two genes.
"""

GVF_TEXT = """\
##gff-version 3
##gvf-version 1.07
##genome-build test GRCh38
##sequence-region 7 1 159345973
7\tdbSNP\tSNV\t5150\t5150\t.\t+\t.\tID=1;Variant_seq=A;Dbxref=dbSNP_151:rs111;evidence_values=Frequency;Reference_seq=T
7\tdbSNP\tSNV\t91000\t91000\t.\t+\t.\tID=2;Variant_seq=G;Reference_seq=C;Variant_effect=intron_variant 0 primary_transcript ENST00000900001,missense_variant 0 mRNA ENST00000900002,intron_variant 0 primary_transcript ENST00000900003,synonymous_variant 0 mRNA ENST00000900002;global_minor_allele_frequency=1|0.25;Dbxref=dbSNP_151:rs222
7\tdbSNP\tSNV\t99999\t99999\t.\t+\t.\tID=3;Variant_seq=C;Reference_seq=G;note=no dbxref here
"""

GTF_TEXT = """\
#!genome-build test GRCh38
7\thavana\tgene\t90000\t95000\t.\t-\t.\tgene_id "ENSG00000700001"; gene_name "AAAX"; gene_biotype "protein_coding";
7\thavana\ttranscript\t90000\t93000\t.\t-\t.\tgene_id "ENSG00000700001"; transcript_id "ENST00000900001"; gene_name "AAAX"; gene_biotype "protein_coding";
7\thavana\texon\t90000\t90100\t.\t-\t.\tgene_id "ENSG00000700001"; transcript_id "ENST00000900001"; exon_id "ENSE00000000001";
7\thavana\ttranscript\t90500\t94000\t.\t-\t.\tgene_id "ENSG00000700001"; transcript_id "ENST00000900002"; gene_name "AAAX"; gene_biotype "protein_coding";
7\thavana\ttranscript\t96000\t97000\t.\t+\t.\tgene_id "ENSG00000700002"; transcript_id "ENST00000900003"; gene_name "BBBY"; gene_biotype "lincRNA";
7\thavana\ttranscript\t96000\t96500\t.\t+\t.\tgene_id "ENSG00000700002"; transcript_id "ENST00000900004";
"""


def write_fixture(tmp_path, name: str, text: str) -> str:
    path = tmp_path / name
    path.write_text(text)
    return str(path)
